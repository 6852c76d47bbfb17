"""Producer-fused activation quantization kernels.

VERDICT r4 next #2: the prefill speed-of-light study (DESIGN.md) measured
the standalone activation-quant fusions at ~23 ms of a 144 ms TinyLlama
QAT prefill step — absmax+round lane reductions running at ~2x their HBM
floor, because XLA schedules them as separate reduce + elementwise passes
over the bf16 activations (read for absmax, read again for round, write
int8; and the bf16 operand itself round-trips HBM between the producing op
and the quantizer).

These kernels fuse the quantization into the op that PRODUCES the
activation, so the bf16 tensor never touches HBM at all:

  * ``rmsnorm_quant``   — RMSNorm + per-token symmetric quant in one pass:
    read the residual stream (2B/elt), write int8 (1B/elt) + scales.
    Feeds the q/k/v and gate/up projections (the reference quantizes the
    *normed* hidden state per token, modeling_llama_quant.py:262-289 via
    utils_quant.py:184-188).
  * ``silu_mul_quant``  — SiLU(gate) * up + per-token quant in one pass:
    read gate+up (4B/elt), write int8 (1B/elt) + scales. Feeds the down
    projection (modeling_llama_quant.py:210-230).

Numerics contract (matches ops.quantize.sym_fake_quant / the XLA
composition; measured on v5e: scales bit-identical, ~5% of int values
flip by exactly ±1 where a 1-ulp difference in the fp32 variance
reduction order crosses a round() boundary — two equally-valid fp32
summation orders, the same deviation class as the int-dot-vs-bf16
emulation the fused matmul documents):
the normed / gated value is rounded to the activation dtype (bf16) first —
exactly what the unfused path materializes — then quantized from that
value with the reference's ``s = qmax/(absmax+1e-6)`` and ``round(x*s)``
(utils_quant.py:71-72). RMSNorm accumulates in fp32
(modeling_llama_quant.py:122-123); SiLU's sigmoid is evaluated in fp32
(Mosaic's bf16 sigmoid is unreliable — DESIGN.md Mosaic lessons).

The integer outputs feed XLA's native int8 ``dot_general`` (see
ops/fused_layer.py); the scales ride out as ``[M, 1]`` fp32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6  # reference epsilon (utils_quant.py:71-72)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def supported(x: jax.Array) -> bool:
    """Kernel shape contract: [M, K] with lane-aligned K and sublane-aligned
    M (the training/prefill shapes; anything else falls back to XLA)."""
    if x.ndim != 2:
        return False
    m, k = x.shape
    return m % 8 == 0 and k % 128 == 0 and k >= 128


def _pick_bm(m: int, k: int, n_in: int) -> int:
    """Row-block size: bound the VMEM working set (~n_in bf16 input tiles +
    int8 out, double-buffered) to ~6 MB."""
    budget = 6 * 2**20
    bm = 512
    while bm > 8 and bm * k * (2 * n_in + 1) * 2 > budget:
        bm //= 2
    while m % bm:
        bm //= 2
    return max(bm, 8)


def _rmsnorm_quant_kernel(h_ref, g_ref, xq_ref, sx_ref, *, eps, qmax, out_dt):
    xf = h_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    # cast to the activation dtype BEFORE the scale multiply, then round the
    # product to promote(h, g) — the exact value the unfused path
    # materializes (models/llama.py rms_norm: f32 master norm scales promote
    # the bf16 activation; bf16 scales keep it bf16)
    xn = (xf * jax.lax.rsqrt(var + eps)).astype(h_ref.dtype).astype(jnp.float32)
    xnf = (xn * g_ref[:]).astype(out_dt).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xnf), axis=1, keepdims=True)
    s = qmax / (absmax + _EPS)
    xq_ref[:] = jnp.round(xnf * s).astype(jnp.int8)
    sx_ref[:] = s


def rmsnorm_quant(
    h: jax.Array,  # [M, H] activations (bf16/f32)
    g: jax.Array,  # [H] norm scale
    eps: float,
    a_bits: int,
) -> Tuple[jax.Array, jax.Array]:
    """Fused RMSNorm + per-token symmetric quant: one HBM pass.

    Returns ``(xq int8 [M, H], sx f32 [M, 1])`` with
    ``xq/sx == fake_quant(rms_norm(h, g))`` under the int-dot identity.
    """
    m, k = h.shape
    qmax = float(2 ** (a_bits - 1) - 1)
    out_dt = jnp.promote_types(h.dtype, g.dtype)
    bm = _pick_bm(m, k, n_in=1)
    grid = (m // bm,)
    return pl.pallas_call(
        functools.partial(
            _rmsnorm_quant_kernel, eps=eps, qmax=qmax, out_dt=out_dt
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(h, g.reshape(1, k).astype(jnp.float32))


def _silu_mul_quant_kernel(g_ref, u_ref, yq_ref, sy_ref, *, qmax):
    gf = g_ref[:].astype(jnp.float32)
    # sigmoid in fp32, rounded to the input dtype — mirrors jax.nn.silu's
    # x * sigmoid(x) at the activation dtype (Mosaic's bf16 sigmoid is
    # unreliable, DESIGN.md lessons; XLA's bf16 logistic upcasts anyway)
    sig = jax.lax.logistic(gf).astype(g_ref.dtype)
    y = g_ref[:] * sig * u_ref[:]
    yf = y.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(yf), axis=1, keepdims=True)
    s = qmax / (absmax + _EPS)
    yq_ref[:] = jnp.round(yf * s).astype(jnp.int8)
    sy_ref[:] = s


def silu_mul_quant(
    gate: jax.Array,  # [M, I]
    up: jax.Array,   # [M, I]
    a_bits: int,
) -> Tuple[jax.Array, jax.Array]:
    """Fused SiLU(gate)*up + per-token symmetric quant: one HBM pass.

    Returns ``(yq int8 [M, I], sy f32 [M, 1])``.
    """
    m, k = gate.shape
    qmax = float(2 ** (a_bits - 1) - 1)
    bm = _pick_bm(m, k, n_in=2)
    grid = (m // bm,)
    return pl.pallas_call(
        functools.partial(_silu_mul_quant_kernel, qmax=qmax),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.int8),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(gate, up)
