"""Producer-fused QAT blocks: norm/act fused into the int8 matmul path.

VERDICT r4 next #2. The QAT forward's activation quantizers are lane-dim
reductions that XLA runs as standalone HBM passes (~23 ms of the 144 ms
TinyLlama prefill step, ~2x their floor — DESIGN.md prefill study). Here
the quantization runs inside the op that produces the activation
(ops/pallas/fused_quant.py), the bf16 activation never round-trips HBM,
and the int8 values + per-token scales feed XLA's native int8
``dot_general`` directly.

Two fused blocks cover 3 of the 4 per-layer activation quantizers:

  * ``fused_norm_dense(h, g, ws)``  — RMSNorm -> act-quant -> N int8
    matmuls sharing the quantized activation (q/k/v share the attn norm,
    gate/up share the mlp norm — the reference quantizes the same normed
    tensor once per projection, modeling_llama_quant.py:262-289).
  * ``fused_silu_mul_dense(gate, up, w)`` — SiLU*up -> act-quant -> the
    down projection (modeling_llama_quant.py:210-230).

Gradients are the reference's exact STE semantics (utils_quant.py:77-87):
pass-through masked to zero outside clip_val=[-2, 2] on BOTH the
activation input of each matmul and the latent weight, composed with the
analytic RMSNorm / SiLU backward. Verified against jax.grad of the
unfused composition (tests/test_fused_layer.py).

The backward reconstructs the fake-quant operands from the int8 residuals
(``x_fq = xq/(sx+eps)`` — 1 byte/elt instead of a 2-byte bf16 copy) and
recomputes the cheap elementwise producers (norm, silu) from the block
inputs, so the fusion also SHRINKS residual memory.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import fused_quant
from llm_qat_tpu.ops.pallas.qat_matmul import _quant_int, supported as _qm_supported
from llm_qat_tpu.ops.quantize import DEFAULT_CLIP

_EPS = 1e-6


def supported(x2: jax.Array, w_bits: int, a_bits: int) -> bool:
    return _qm_supported(w_bits, a_bits) and fused_quant.supported(x2)


def _int_dense(xq, sx, wq, sw, out_dtype):
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))).astype(out_dtype)


def _ste_mask(x, dx):
    lo, hi = DEFAULT_CLIP
    return jnp.where((x < hi) & (x > lo), dx, 0.0)


def _rms_norm_bwd(h2, g, eps, dxn):
    """Analytic RMSNorm backward for ``xn = (xf * rsqrt(mean(xf^2)+eps))
    .astype(dt) * g`` (casts treated as identity, matching autodiff of the
    unfused composition to bf16 rounding)."""
    xf = h2.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    u = xf * r
    du = dxn * g.astype(jnp.float32)
    H = h2.shape[-1]
    dxf = r * du - (r / H) * u * jnp.sum(u * du, axis=-1, keepdims=True)
    dg = jnp.sum(dxn * u, axis=0)
    return dxf.astype(h2.dtype), dg.astype(g.dtype)


# ---------------------------------------------------------------------------
# RMSNorm -> quant -> N shared-activation matmuls
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _norm_dense(w_bits: int, a_bits: int, eps: float, h2, g, *ws):
    out, _ = _norm_dense_fwd(w_bits, a_bits, eps, h2, g, *ws)
    return out


def _norm_dense_fwd(w_bits, a_bits, eps, h2, g, *ws):
    out_dt = jnp.promote_types(h2.dtype, g.dtype)
    xq, sx = fused_quant.rmsnorm_quant(h2, g, eps, a_bits)
    outs = []
    for w in ws:
        wq, sw = _quant_int(w, w_bits, axis=0)
        outs.append(_int_dense(xq, sx, wq, sw, out_dt))
    return tuple(outs), (h2, g, xq, sx, ws)


def _norm_dense_bwd(w_bits, a_bits, eps, res, gs):
    h2, g, xq, sx, ws = res
    mm_t = gs[0].dtype
    x_fq = (xq.astype(jnp.float32) / (sx + _EPS)).astype(mm_t)
    # recompute the normed activation for the STE clip mask (elementwise)
    xf = h2.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xn = (xf * r).astype(h2.dtype) * g

    dxn = jnp.zeros(h2.shape, jnp.float32)
    dws = []
    for w, gy in zip(ws, gs):
        wq, sw = _quant_int(w, w_bits, axis=0)
        w_fq = (wq.astype(jnp.float32) / (sw + _EPS)).astype(mm_t)
        dxn = dxn + jnp.matmul(gy, w_fq.T, preferred_element_type=jnp.float32)
        dw = jnp.matmul(x_fq.T, gy, preferred_element_type=jnp.float32)
        dws.append(_ste_mask(w, dw).astype(w.dtype))
    dxn = _ste_mask(xn, dxn)
    dh, dg = _rms_norm_bwd(h2, g, eps, dxn)
    return (dh, dg, *dws)


_norm_dense.defvjp(_norm_dense_fwd, _norm_dense_bwd)


def fused_norm_dense(
    h: jax.Array,   # [..., H] residual stream
    g: jax.Array,   # [H] norm scale
    ws: Tuple[jax.Array, ...],  # each [H, N_i] latent fp weights
    *,
    w_bits: int,
    a_bits: int,
    eps: float,
) -> Tuple[jax.Array, ...]:
    """``(act_fq(rms_norm(h, g)) @ w_fq for w in ws)`` in one fused pass."""
    lead = h.shape[:-1]
    h2 = h.reshape(-1, h.shape[-1])
    outs = _norm_dense(w_bits, a_bits, eps, h2, g, *ws)
    return tuple(o.reshape(*lead, w.shape[-1]) for o, w in zip(outs, ws))


# ---------------------------------------------------------------------------
# SiLU(gate) * up -> quant -> down projection
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Flash-layout attention projections (round 5)
#
# The prefill trace (DESIGN.md round-5 study) shows ~15 ms/step of XLA
# transpose/copy glue moving q and the attention output between the model's
# token-major [b, s, nh*hd] layout and the flash kernel's head-major
# [b*kvh, g, s, hd] layout — Mosaic cannot slice the tiled (nh, hd) minor
# dims, so a kernel-side fix is structurally blocked (DESIGN.md prefill
# study). Measured on v5e: XLA's int8 dot_general runs the projection AS AN
# EINSUM STRAIGHT INTO / OUT OF the flash layout at the same speed as the
# flat matmul (1.49 vs 1.49 ms q-side, 1.95 vs 1.83 o-side at the
# TinyLlama prefill shape). So the relayout rides the MXU for free:
#
#   q = einsum('bsh,hkgd->bkgsd', xq, wq)     # proj EMITS flash layout
#   o = einsum('bkgsd,kgdh->bsh', attn_q, wo) # proj CONSUMES flash layout
#
# The int values and scales are identical to the flat path (integer dots
# are exact), so numerics match the reference contract bit-for-bit.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _norm_qkv_flash(w_bits, a_bits, eps, kvh, h3, g, wq, wk, wv):
    out, _ = _norm_qkv_flash_fwd(w_bits, a_bits, eps, kvh, h3, g, wq, wk, wv)
    return out


def _einsum_int(spec, xq, wq, sx, sw, out_dt):
    acc = jnp.einsum(spec, xq, wq, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))).astype(out_dt)


def _norm_qkv_flash_fwd(w_bits, a_bits, eps, kvh, h3, g, wq, wk, wv):
    """h3 [b, s, H] -> q5 [b, kvh, groups, s, d], k4/v4 [b, kvh, s, d]."""
    b, s, H = h3.shape
    out_dt = jnp.promote_types(h3.dtype, g.dtype)
    Dq, Dkv = wq.shape[1], wk.shape[1]
    d = Dkv // kvh
    groups = Dq // Dkv
    xq, sx = fused_quant.rmsnorm_quant(h3.reshape(b * s, H), g, eps, a_bits)
    xq3 = xq.reshape(b, s, H)
    sx_q = sx.reshape(b, 1, 1, s, 1)
    sx_kv = sx.reshape(b, 1, s, 1)

    wq5 = wq.reshape(H, kvh, groups, d)
    wk4 = wk.reshape(H, kvh, d)
    wv4 = wv.reshape(H, kvh, d)
    wqq, swq = _quant_int(wq, w_bits, axis=0)   # [1, Dq] scales
    wkq, swk = _quant_int(wk, w_bits, axis=0)
    wvq, swv = _quant_int(wv, w_bits, axis=0)

    q5 = _einsum_int(
        "bsh,hkgd->bkgsd", xq3, wqq.reshape(wq5.shape), sx_q,
        swq.reshape(1, kvh, groups, 1, d), out_dt,
    )
    k4 = _einsum_int(
        "bsh,hkd->bksd", xq3, wkq.reshape(wk4.shape), sx_kv,
        swk.reshape(1, kvh, 1, d), out_dt,
    )
    v4 = _einsum_int(
        "bsh,hkd->bksd", xq3, wvq.reshape(wv4.shape), sx_kv,
        swv.reshape(1, kvh, 1, d), out_dt,
    )
    return (q5, k4, v4), (h3, g, xq, sx, wq, wk, wv)


def _norm_qkv_flash_bwd(w_bits, a_bits, eps, kvh, res, gs):
    dq5, dk4, dv4 = gs
    h3, g, xq, sx, wq, wk, wv = res
    b, s, H = h3.shape
    d = wk.shape[1] // kvh
    groups = wq.shape[1] // wk.shape[1]
    mm_t = dq5.dtype
    x_fq3 = (xq.astype(jnp.float32) / (sx + _EPS)).astype(mm_t).reshape(b, s, H)

    h2 = h3.reshape(b * s, H)
    xf = h2.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xn = (xf * r).astype(h3.dtype) * g

    def wfq(w):
        q, sw = _quant_int(w, w_bits, axis=0)
        return (q.astype(jnp.float32) / (sw + _EPS)).astype(mm_t)

    wq_fq = wfq(wq).reshape(H, kvh, groups, d)
    wk_fq = wfq(wk).reshape(H, kvh, d)
    wv_fq = wfq(wv).reshape(H, kvh, d)

    dxn = (
        jnp.einsum("bkgsd,hkgd->bsh", dq5, wq_fq,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bksd,hkd->bsh", dk4, wk_fq,
                     preferred_element_type=jnp.float32)
        + jnp.einsum("bksd,hkd->bsh", dv4, wv_fq,
                     preferred_element_type=jnp.float32)
    ).reshape(b * s, H)
    dxn = _ste_mask(xn, dxn)
    dh2, dg = _rms_norm_bwd(h2, g, eps, dxn)

    dwq = jnp.einsum("bsh,bkgsd->hkgd", x_fq3, dq5,
                     preferred_element_type=jnp.float32).reshape(wq.shape)
    dwk = jnp.einsum("bsh,bksd->hkd", x_fq3, dk4,
                     preferred_element_type=jnp.float32).reshape(wk.shape)
    dwv = jnp.einsum("bsh,bksd->hkd", x_fq3, dv4,
                     preferred_element_type=jnp.float32).reshape(wv.shape)
    return (
        dh2.reshape(h3.shape),
        dg,
        _ste_mask(wq, dwq).astype(wq.dtype),
        _ste_mask(wk, dwk).astype(wk.dtype),
        _ste_mask(wv, dwv).astype(wv.dtype),
    )


_norm_qkv_flash.defvjp(_norm_qkv_flash_fwd, _norm_qkv_flash_bwd)


def fused_norm_qkv_flash(
    h: jax.Array,   # [b, s, H]
    g: jax.Array,   # [H]
    wq: jax.Array,  # [H, nh*hd]
    wk: jax.Array,  # [H, kvh*hd]
    wv: jax.Array,  # [H, kvh*hd]
    kvh: int,
    *,
    w_bits: int,
    a_bits: int,
    eps: float,
):
    """RMSNorm + act-quant + q/k/v projections emitting the flash kernel's
    head-major layout: ``q [b, kvh, g, s, d]; k, v [b, kvh, s, d]``."""
    return _norm_qkv_flash(w_bits, a_bits, eps, kvh, h, g, wq, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _attn_out_dense(w_bits, a_bits, attn5, wo):
    out, _ = _attn_out_dense_fwd(w_bits, a_bits, attn5, wo)
    return out


def _quant_per_token_heads(attn5, a_bits):
    """Per-token symmetric act quant with the token's hidden dim spread
    over (kvh, g, d): absmax over those axes == the flat per-token absmax.

    The max runs at the input dtype and only the reduced absmax upcasts
    (max is exact in bf16) — matching ``_quant_int`` bit-for-bit AND
    keeping XLA from materializing an f32 copy of the whole attention
    tensor (traced at ~8 ms/step before this ordering)."""
    qmax = float(2 ** (a_bits - 1) - 1)
    am = jnp.max(jnp.abs(attn5), axis=(1, 2, 4), keepdims=True)
    s = qmax / (am.astype(jnp.float32) + _EPS)
    return jnp.round(attn5.astype(jnp.float32) * s).astype(jnp.int8), s


def _attn_out_dense_fwd(w_bits, a_bits, attn5, wo):
    b, kvh, groups, s, d = attn5.shape
    H = wo.shape[1]
    # quantize in the flash-native layout, o-projection as an int8 einsum
    # consuming it. XLA's layout assignment still routes an f32
    # convert+copy of the attention tensor through the quantize chain
    # (~10 ms/step traced); two alternatives measured WORSE: an s8-side
    # explicit transpose + flat matmul (+2.7 ms — int8 sublane relayouts
    # are slower than the f32 copy), and an optimization_barrier fence
    # (no change — layout assignment passes through barriers).
    aq, sa = _quant_per_token_heads(attn5, a_bits)
    woq, swo = _quant_int(wo, w_bits, axis=0)   # [1, H]
    out = _einsum_int(
        "bkgsd,kgdh->bsh", aq, woq.reshape(kvh, groups, d, H),
        sa.reshape(b, s, 1), swo.reshape(1, 1, H), attn5.dtype,
    )
    return out, (attn5, aq, sa, wo)


def _attn_out_dense_bwd(w_bits, a_bits, res, gy):
    attn5, aq, sa, wo = res
    b, kvh, groups, s, d = attn5.shape
    H = wo.shape[1]
    mm_t = gy.dtype
    woq, swo = _quant_int(wo, w_bits, axis=0)
    wo_fq = (woq.astype(jnp.float32) / (swo + _EPS)).astype(mm_t)
    a_fq = (aq.astype(jnp.float32) / (sa + _EPS)).astype(mm_t)

    da = jnp.einsum("bsh,kgdh->bkgsd", gy, wo_fq.reshape(kvh, groups, d, H),
                    preferred_element_type=jnp.float32)
    da = _ste_mask(attn5, da).astype(attn5.dtype)
    dwo = jnp.einsum("bkgsd,bsh->kgdh", a_fq, gy,
                     preferred_element_type=jnp.float32).reshape(wo.shape)
    return da, _ste_mask(wo, dwo).astype(wo.dtype)


_attn_out_dense.defvjp(_attn_out_dense_fwd, _attn_out_dense_bwd)


def fused_attn_out_dense(
    attn5: jax.Array,  # [b, kvh, g, s, d] flash-layout attention output
    wo: jax.Array,     # [nh*hd, H]
    *,
    w_bits: int,
    a_bits: int,
) -> jax.Array:
    """Per-token act-quant + o-projection consuming the flash layout
    directly — ``[b, s, H]`` out, no relayout copy."""
    return _attn_out_dense(w_bits, a_bits, attn5, wo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _silu_mul_dense(w_bits: int, a_bits: int, gate2, up2, w):
    out, _ = _silu_mul_dense_fwd(w_bits, a_bits, gate2, up2, w)
    return out


def _silu_mul_dense_fwd(w_bits, a_bits, gate2, up2, w):
    yq, sy = fused_quant.silu_mul_quant(gate2, up2, a_bits)
    wq, sw = _quant_int(w, w_bits, axis=0)
    out = _int_dense(yq, sy, wq, sw, gate2.dtype)
    return out, (gate2, up2, yq, sy, w)


def _silu_mul_dense_bwd(w_bits, a_bits, res, gy):
    gate2, up2, yq, sy, w = res
    mm_t = gy.dtype
    wq, sw = _quant_int(w, w_bits, axis=0)
    w_fq = (wq.astype(jnp.float32) / (sw + _EPS)).astype(mm_t)
    y_fq = (yq.astype(jnp.float32) / (sy + _EPS)).astype(mm_t)

    gf = gate2.astype(jnp.float32)
    sig = jax.lax.logistic(gf)
    silu = (gf * sig).astype(gate2.dtype)
    y = silu * up2  # recomputed product for the STE mask

    dy = jnp.matmul(gy, w_fq.T, preferred_element_type=jnp.float32)
    dy = _ste_mask(y, dy)
    dw = jnp.matmul(y_fq.T, gy, preferred_element_type=jnp.float32)
    dw = _ste_mask(w, dw).astype(w.dtype)

    dgate = dy * up2.astype(jnp.float32) * (sig * (1.0 + gf * (1.0 - sig)))
    dup = dy * silu.astype(jnp.float32)
    return dgate.astype(gate2.dtype), dup.astype(up2.dtype), dw


_silu_mul_dense.defvjp(_silu_mul_dense_fwd, _silu_mul_dense_bwd)


def fused_silu_mul_dense(
    gate: jax.Array,  # [..., I]
    up: jax.Array,    # [..., I]
    w: jax.Array,     # [I, H]
    *,
    w_bits: int,
    a_bits: int,
) -> jax.Array:
    """``act_fq(silu(gate) * up) @ w_fq`` in one fused pass."""
    lead = gate.shape[:-1]
    g2 = gate.reshape(-1, gate.shape[-1])
    u2 = up.reshape(-1, up.shape[-1])
    out = _silu_mul_dense(w_bits, a_bits, g2, u2, w)
    return out.reshape(*lead, w.shape[-1])
