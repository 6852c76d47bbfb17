"""Fake-quantization primitives with straight-through-estimator (STE) gradients.

TPU-native re-design of the reference quantizers
(reference: models/utils_quant.py:31-162 `SymQuantizer`/`AsymQuantizer`,
models/utils_quant.py:165-255 `QuantizeLinear`). Instead of torch
``autograd.Function`` classes dispatching on ``ndim``, we expose *pure
functions* parameterized by an explicit reduction ``axis`` and wrap them in
``jax.custom_vjp`` for the STE backward. Everything here is jit-traceable with
static shapes so XLA can fuse the quantize-dequantize arithmetic into the
surrounding matmuls on the MXU; a fused Pallas path lives in
``llm_qat_tpu.ops.pallas``.

Numerics contract (kept bit-faithful to the reference; deviations only behind
flags):
  * symmetric scale ``s = (2^(b-1)-1) / (absmax + 1e-6)`` and dequant divides
    by ``s + 1e-6`` (reference utils_quant.py:71-72);
  * asymmetric uses ``alpha = max-min``, ``beta = min``, ``1e-8`` epsilon
    (reference utils_quant.py:144-147);
  * rounding is round-half-to-even (both ``torch.round`` and ``jnp.round``);
  * the forward does NOT clamp (clamping is commented out in the reference,
    utils_quant.py:46-48); the backward zeroes gradients where the *input*
    is ``>= clip_hi`` or ``<= clip_lo`` with the fixed default clip ``[-2, 2]``
    (reference utils_quant.py:83-87);
  * 1-bit and 2-bit weight branches use a plain identity STE (the
    ``q.detach() - w.detach() + w`` trick, reference utils_quant.py:240-242)
    with NO clip mask.

Granularity mapping from the reference's ndim dispatch to our ``axis``:
  * ``layerwise=True``            -> ``axis=None``      (per-tensor)
  * 2-D weight  [out, in] last-dim -> here weights are stored ``[in, out]``
    so per-output-channel absmax is ``axis=0``;
  * 3-D act [b, s, h] last-dim     -> ``axis=-1``        (per-token)
  * 4-D act [b, h, s, d] last-2    -> ``axis=(-2, -1)``  (per-head)
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Axis = Union[None, int, Sequence[int]]

# Fixed STE clip range used everywhere by the reference
# (utils_quant.py:198, :245; modeling_llama_quant.py:251-252).
DEFAULT_CLIP: Tuple[float, float] = (-2.0, 2.0)

# Epsilons matching the reference exactly (utils_quant.py:71-72, :144-147).
_SYM_EPS = 1e-6
_ASYM_EPS = 1e-8


def _canon_axis(axis: Axis) -> Optional[Tuple[int, ...]]:
    if axis is None:
        return None
    if isinstance(axis, int):
        return (axis,)
    return tuple(axis)


# ---------------------------------------------------------------------------
# Symmetric uniform fake-quant (reference SymQuantizer, utils_quant.py:31-87)
# ---------------------------------------------------------------------------


def sym_fake_quant_raw(x: jax.Array, bits: int, axis: Axis) -> jax.Array:
    """Quantize-dequantize without STE wrapping (differentiable as written).

    ``s = (2^(b-1)-1)/(absmax+1e-6)``; ``out = round(x*s)/(s+1e-6)``.
    absmax is stop-gradiented (the reference ``.detach()``s it,
    utils_quant.py:53-68; the per-tensor branch does not detach but the STE
    backward makes that moot).
    """
    ax = _canon_axis(axis)
    absmax = jnp.max(jnp.abs(x), axis=ax, keepdims=ax is not None)
    absmax = jax.lax.stop_gradient(absmax)
    qmax = float(2 ** (bits - 1) - 1)
    s = qmax / (absmax + _SYM_EPS)
    return jnp.round(x * s) / (s + _SYM_EPS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def sym_fake_quant(
    x: jax.Array,
    bits: int,
    axis: Axis = -1,
    clip: Tuple[float, float] = DEFAULT_CLIP,
) -> jax.Array:
    """Symmetric dynamic-range fake-quant with STE backward.

    Gradient passes through unchanged except where ``x >= clip[1]`` or
    ``x <= clip[0]`` (inclusive, matching ``ge``/``le`` at
    utils_quant.py:85-86), where it is zeroed.
    """
    return sym_fake_quant_raw(x, bits, axis)


def _sym_fwd(x, bits, axis, clip):
    return sym_fake_quant_raw(x, bits, axis), x


def _sym_bwd(bits, axis, clip, x, g):
    lo, hi = clip
    mask = (x < hi) & (x > lo)
    return (jnp.where(mask, g, 0.0).astype(g.dtype),)


sym_fake_quant.defvjp(_sym_fwd, _sym_bwd)


# ---------------------------------------------------------------------------
# Asymmetric min-max fake-quant (reference AsymQuantizer, utils_quant.py:90-162)
# ---------------------------------------------------------------------------


def asym_fake_quant_raw(x: jax.Array, bits: int, axis: Axis) -> jax.Array:
    """Min-max affine quantize-dequantize.

    ``alpha = max - min``, ``beta = min`` (both stop-grad),
    normalize to [0,1], round onto ``2^b - 1`` levels, denormalize
    (utils_quant.py:110-149).
    """
    ax = _canon_axis(axis)
    keep = ax is not None
    xmax = jax.lax.stop_gradient(jnp.max(x, axis=ax, keepdims=keep))
    xmin = jax.lax.stop_gradient(jnp.min(x, axis=ax, keepdims=keep))
    alpha = xmax - xmin
    beta = xmin
    xn = (x - beta) / (alpha + _ASYM_EPS)
    levels = float(2**bits - 1)
    q = jnp.round(xn * levels) / levels
    return q * (alpha + _ASYM_EPS) + beta


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def asym_fake_quant(
    x: jax.Array,
    bits: int,
    axis: Axis = -1,
    clip: Tuple[float, float] = DEFAULT_CLIP,
) -> jax.Array:
    """Asymmetric fake-quant with the same STE clip backward as symmetric."""
    return asym_fake_quant_raw(x, bits, axis)


def _asym_fwd(x, bits, axis, clip):
    return asym_fake_quant_raw(x, bits, axis), x


def _asym_bwd(bits, axis, clip, x, g):
    lo, hi = clip
    mask = (x < hi) & (x > lo)
    return (jnp.where(mask, g, 0.0).astype(g.dtype),)


asym_fake_quant.defvjp(_asym_fwd, _asym_bwd)


# ---------------------------------------------------------------------------
# Sub-3-bit weight branches (reference QuantizeLinear.forward,
# utils_quant.py:204-242) — identity STE via custom_vjp (equivalent to the
# detach trick `q.detach() - w.detach() + w`).
# ---------------------------------------------------------------------------


def _binary_weight_raw(w: jax.Array, axis: Axis) -> jax.Array:
    """1-bit BWN: ``scale * sign(w / scale)``, scale = mean|w|
    (per-row ``dim=1`` in the reference = reduction over the input dim;
    with our ``[in, out]`` layout that is ``axis=0``). utils_quant.py:204-212.
    """
    ax = _canon_axis(axis)
    scale = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(w), axis=ax, keepdims=ax is not None)
    )
    return scale * jnp.sign(w / scale)


def _twobit_weight_raw(w: jax.Array, axis: Axis) -> jax.Array:
    """2-bit: half-level-offset rounding of ``w / (2*mean|w|)`` clamped to
    ±(1-1e-2), levels = 2^(b-1) = 2. utils_quant.py:216-238."""
    ax = _canon_axis(axis)
    num_levels = 2.0  # 2 ** (w_bits - 1) with w_bits == 2
    clip_val = 1.0 - 1e-2
    scale = 2.0 * jax.lax.stop_gradient(
        jnp.mean(jnp.abs(w), axis=ax, keepdims=ax is not None)
    )
    q = (
        jnp.round(
            jnp.clip(w / scale, -clip_val, clip_val) * num_levels - 0.5
        )
        + 0.5
    ) / num_levels
    return scale * q


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def lowbit_weight_fake_quant(w: jax.Array, bits: int, axis: Axis = 0) -> jax.Array:
    """1/2-bit weight fake-quant with *identity* STE (no clip mask)."""
    if bits == 1:
        return _binary_weight_raw(w, axis)
    return _twobit_weight_raw(w, axis)


def _lowbit_fwd(w, bits, axis):
    return lowbit_weight_fake_quant(w, bits, axis), None


def _lowbit_bwd(bits, axis, _, g):
    return (g,)


lowbit_weight_fake_quant.defvjp(_lowbit_fwd, _lowbit_bwd)


# ---------------------------------------------------------------------------
# Dispatch helpers mirroring QuantizeLinear's policy (utils_quant.py:190-248)
# ---------------------------------------------------------------------------


def weight_fake_quant(
    w: jax.Array,
    bits: int,
    *,
    layerwise: bool = False,
) -> jax.Array:
    """Weight quantization policy of ``QuantizeLinear`` (utils_quant.py:193-242).

    ``w`` is stored ``[in_features, out_features]`` (TPU-friendly ``x @ w``);
    per-output-channel reduction is therefore ``axis=0``.

      * bits >= 32 : passthrough
      * bits >= 3  : symmetric per-output-channel, STE with ±2 clip mask
      * bits == 2/1: scaled-mean branches with identity STE
    """
    if bits >= 32:
        return w
    axis = None if layerwise else 0
    if bits >= 3:
        return sym_fake_quant(w, bits, axis)
    return lowbit_weight_fake_quant(w, bits, axis)


def act_fake_quant(
    x: jax.Array,
    bits: int,
    *,
    symmetric: bool = True,
    layerwise: bool = False,
) -> jax.Array:
    """Activation quantization policy: only active when ``2 < bits < 32``
    (utils_quant.py:184-188, :244-248); per-token (last-dim) granularity."""
    if not (2 < bits < 32):
        return x
    axis = None if layerwise else -1
    fn = sym_fake_quant if symmetric else asym_fake_quant
    return fn(x, bits, axis)


def kv_fake_quant(x: jax.Array, bits: int) -> jax.Array:
    """KV-cache fake-quant: symmetric per-token over the full hidden dim,
    applied to ``[b, s, hidden]`` BEFORE head reshape / RoPE / cache concat
    (reference modeling_llama_quant.py:320-333). Active when ``bits < 32``."""
    if bits >= 32:
        return x
    return sym_fake_quant(x, bits, -1)
