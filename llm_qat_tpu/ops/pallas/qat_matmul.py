"""Fused fake-quant matmul for QAT: int8 MXU forward + STE backward.

SURVEY.md §7 "STE-in-Pallas ... fusing the backward mask into the matmul
grad is the speed-of-light requirement". Observation that makes this exact
rather than approximate: the fake-quant matmul

    sym_fake_quant(x) @ sym_fake_quant(w)
      = sum_k (qx[i,k]/sx'[i]) * (qw[k,j]/sw'[j])
      = (qx[i,:] . qw[:,j]) / (sx'[i] * sw'[j])

so the integer dot (exact in int32) followed by one scale fixup IS the
fake-quant product — with *less* rounding error than the bf16 emulation.
The QAT forward therefore runs on the int8 MXU path (2x rate, half the
weight bytes) via XLA's native int8 ``dot_general``, and the custom VJP applies
the reference's STE masks (zero outside ±2, utils_quant.py:83-87) around
plain bf16 backward matmuls against the *fake-quant* operands.

Valid for ``3 <= w_bits <= 8`` and ``2 < a_bits <= 8`` (the int8 container
covers both); other configs fall back to `ops.linear.quant_dense`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.quantize import DEFAULT_CLIP

_EPS = 1e-6


def supported(w_bits: int, a_bits: int) -> bool:
    return 3 <= w_bits <= 8 and 2 < a_bits <= 8


def _quant_int(x: jax.Array, bits: int, axis: int) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int quantization along ``axis`` into an int8 container."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    s = qmax / (absmax.astype(jnp.float32) + _EPS)
    q = jnp.round(x.astype(jnp.float32) * s).astype(jnp.int8)
    return q, s


def _fwd_impl(x2: jax.Array, w: jax.Array, w_bits: int, a_bits: int):
    xq, sx = _quant_int(x2, a_bits, axis=-1)
    wq, sw = _quant_int(w, w_bits, axis=0)
    # The int32 dot is exact, so XLA's native int8 dot_general and the Pallas
    # int8 kernel are bit-identical here; XLA's is ~1.7-2x faster at training
    # shapes (M = b*s >= 512: measured 406 vs 234 TF/s on v5e at M=8192).
    # The Pallas kernel (quant_matmul.int8_matmul) remains the decode/serving
    # path, where small-M weight-HBM-bound tiling is what matters.
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))
    return out, (xq, sx, wq, sw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_quant_matmul(
    x: jax.Array,   # [..., K] activations
    w: jax.Array,   # [K, N] latent fp weights
    w_bits: int,
    a_bits: int,
) -> jax.Array:
    """``act_fake_quant(x) @ weight_fake_quant(w)`` on the int8 MXU."""
    lead = x.shape[:-1]
    out, _ = _fwd_impl(x.reshape(-1, x.shape[-1]), w, w_bits, a_bits)
    return out.reshape(*lead, w.shape[-1]).astype(x.dtype)


def _fq_fwd(x, w, w_bits, a_bits):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out, (xq, sx, wq, sw) = _fwd_impl(x2, w, w_bits, a_bits)
    # residuals: int values + scales reconstruct the fake-quant operands for
    # the backward matmuls; raw x/w only for the STE clip masks
    return (
        out.reshape(*lead, w.shape[-1]).astype(x.dtype),
        (x, w, xq, sx, wq, sw),
    )


def _fq_bwd(w_bits, a_bits, res, g):
    x, w, xq, sx, wq, sw = res
    lead = x.shape[:-1]
    # backward matmuls run at the model compute dtype (bf16 under the
    # canonical recipe — matching the reference's bf16 autocast backward,
    # run_train.sh:15) with fp32 MXU accumulation; fp32 inputs stay fp32
    mm_t = g.dtype
    g2 = g.reshape(-1, g.shape[-1])

    # fake-quant operands (dequantized ints == round(x*s)/(s+eps))
    x_fq = (xq.astype(jnp.float32) / (sx + _EPS)).astype(mm_t)
    w_fq = (wq.astype(jnp.float32) / (sw + _EPS)).astype(mm_t)

    lo, hi = DEFAULT_CLIP
    dx = jnp.matmul(g2, w_fq.T, preferred_element_type=jnp.float32)
    x2 = x.reshape(-1, x.shape[-1])
    dx = jnp.where((x2 < hi) & (x2 > lo), dx, 0.0)

    dw = jnp.matmul(x_fq.T, g2, preferred_element_type=jnp.float32)
    dw = jnp.where((w < hi) & (w > lo), dw, 0.0)

    return dx.reshape(*lead, x.shape[-1]).astype(x.dtype), dw.astype(w.dtype)


fused_quant_matmul.defvjp(_fq_fwd, _fq_bwd)
