"""Whole-model decode megakernel: one ``pallas_call`` for all L layers.

DESIGN.md "Decode speed-of-light study" (round 1-2): the scan path's decode
step measures ~19% of the weight+KV HBM floor because XLA materializes an
HBM copy of every per-layer slice that feeds a Pallas custom call (~44 MB of
weights + ~8.5 MB of cache per layer per step), and the scalar-prefetch
stacked-kernel variants serialize their DMAs behind scalar-dependent index
maps. This kernel removes the structural problem: the grid is ``(L,)`` over
layers, every weight/cache tensor stays in HBM (``memory_space=ANY``, no
BlockSpec slicing), and the kernel streams weight chunks and KV blocks into
VMEM itself with double-buffered ``make_async_copy`` DMAs — so layer
``l+1``'s first weight chunks are in flight while layer ``l``'s MLP still
computes, and nothing is ever copied HBM->HBM.

Numerics mirror the scan path (inference/model.py::_serving_layer at s=1)
op for op:
  * per-token int8 activation quant (+1e-6 epsilons) -> int8 MXU dot ->
    ``acc / ((sx+eps)(sw+eps))`` fixup — same math as
    quant_matmul.int8_matmul / int8_matmul_xla (exact int32 dot);
  * KV written per-token pre-RoPE (modeling_llama_quant.py:320-333) as
    int8 + inverse scales at each slot's own ``write_pos`` (inactive slots
    write the scratch row ``S-1``), bit-identical integers to
    model._write_kv;
  * attention = decode_attention's online softmax, streaming the int8
    cache in BK-column blocks: dequant + (pre mode) table-RoPE folded into
    the cos/sin coefficients, f32 scores/accumulator, current token folded
    as a final online-softmax pair (active slots only);
  * residual stream carried in VMEM scratch across the grid (one layer per
    grid step), fp32-accum RMSNorm.

Supported: w_bits == 8, b <= 32, NC | {Dq, H, 2I}, BK | S. Other configs
fall back to the scan path in model._forward.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig

_EPS = 1e-6      # reference epsilon (utils_quant.py:71-72)
_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def supported(config: LlamaConfig, b: int, max_len: int) -> bool:
    c = config
    if c.w_bits != 8 or not (2 < c.a_bits <= 8):
        return False
    if c.kv_cache_pack and c.kv_bits <= 4:
        return False  # nibble-packed cache: scan path handles it
    if b > 32:
        return False
    nc = _pick_nc(c)
    dq = c.hidden_size + 2 * c.kv_heads * c.head_dim
    if nc < 128 and not _interpret():
        return False
    if c.hidden_size % nc or dq % nc or (2 * c.intermediate_size) % nc:
        return False
    if c.hidden_size // nc < 2:
        return False
    bk = _pick_bk(max_len)
    if max_len % bk:
        return False
    return True


def _pick_nc(c: LlamaConfig) -> int:
    import math

    dq = c.hidden_size + 2 * c.kv_heads * c.head_dim
    g = math.gcd(math.gcd(c.hidden_size, dq), 2 * c.intermediate_size)
    nc = 512
    while nc > g or g % nc:
        nc //= 2
        if nc == 0:
            return g
    # the down stage needs >= 2 chunks (its double buffer primes the next
    # layer's pipeline)
    while nc > 1 and c.hidden_size // nc < 2 and nc % 2 == 0:
        nc //= 2
    return nc


def _pick_bk(max_len: int) -> int:
    bk = 512
    while max_len % bk:
        bk //= 2
    return max(bk, 1)


def _kernel(
    # scalar prefetch
    lens_ref,     # [b] int32 — pre-append length per slot
    act_ref,      # [b] int32 — 1 where the slot commits
    # VMEM inputs
    x_ref,        # [b, H] dtype — embedded token
    qcos_ref,     # [b, hd/2] f32 — RoPE at each slot's current position
    qsin_ref,
    actv_ref,     # [b, 1] f32 — 1.0 where the slot commits (VMEM copy of
                  # act_ref: Mosaic-friendly vector form for the fold mask)
    kcos_ref,     # [hd/2, S] f32 — cache K-RoPE tables (pre mode)
    ksin_ref,
    qkv_s_ref,    # [L, 1, Dq] f32 weight scales
    o_s_ref,      # [L, 1, H]
    gu_s_ref,     # [L, 1, 2I]
    dn_s_ref,     # [L, 1, H]
    anorm_ref,    # [L, H]
    mnorm_ref,    # [L, H]
    # HBM (ANY) inputs
    qkv_w_ref,    # [L, H, Dq] int8
    o_w_ref,      # [L, H, H] int8
    gu_w_ref,     # [L, H, 2I] int8
    dn_w_ref,     # [L, I, H] int8
    kq_hbm,       # [L, b, kvh, hd, S] int8 (aliased out)
    ks_hbm,       # [L, b, S] f32       (aliased out)
    vq_hbm,       # [L, b, kvh, S, hd] int8 (aliased out)
    vs_hbm,       # [L, b, S] f32       (aliased out)
    # outputs
    kq_out, ks_out, vq_out, vs_out,   # aliased — written via DMA only
    y_ref,        # [b, H] dtype — final hidden (pre-final-norm)
    # scratch
    h_ref,        # [b, H] dtype — residual stream (persists across grid)
    xq_ref,       # [BM, Kmax] int8 — quantized activations (rows b.. zero)
    qkv_ref,      # [b, Dq] dtype
    attn_ref,     # [b, H] dtype
    gu_ref,       # [b, 2I] dtype
    qrot_ref,     # [b, kvh, groups, hd] f32 — post-RoPE query
    m_ref,        # [b, kvh, groups, 1] f32
    l_ref,        # [b, kvh, groups, 1] f32
    acc_ref,      # [b, kvh, groups, hd] f32
    kst_ref,      # [b, kvh, hd, 1] int8 — current-token K staging
    vst_ref,      # [b, kvh, 1, hd] int8
    kss_ref,      # [b, 1] f32 — inverse scales staging
    vss_ref,      # [b, 1] f32
    wA_ref,       # [2, H, NC] int8
    wB_ref,       # [2, I, NC] int8
    kbuf_ref,     # [2, b, kvh, hd, BK] int8
    ksb_ref,      # [2, b, BK] f32
    vbuf_ref,     # [2, b, kvh, BK, hd] int8
    vsb_ref,      # [2, b, BK] f32
    semA, semB, sematt, semwr,
    *,
    cfg: LlamaConfig,
    b: int,
    BM: int,
    NC: int,
    BK: int,
    rope: bool,    # pre mode: rotate K on read
    dtype,
):
    c = cfg
    L = c.num_hidden_layers
    H = c.hidden_size
    I = c.intermediate_size
    hd = c.head_dim
    h2 = hd // 2
    kvh = c.kv_heads
    nh = c.num_attention_heads
    groups = nh // kvh
    kv_dim = kvh * hd
    Dq = H + 2 * kv_dim
    S = kq_hbm.shape[-1]
    kb_bits = min(c.kv_bits, 8)
    scale = 1.0 / (hd ** 0.5)
    a_qmax = float(2 ** (c.a_bits - 1) - 1)
    kv_qmax = float(2 ** (kb_bits - 1) - 1)
    ct = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    l_id = pl.program_id(0)

    # ---- static weight-chunk schedule -----------------------------------
    nq, no, ngu, nB = Dq // NC, H // NC, (2 * I) // NC, H // NC
    A_SCHED = (
        [("qkv", j) for j in range(nq)]
        + [("o", j) for j in range(no)]
        + [("gu", j) for j in range(ngu)]
    )
    nA = len(A_SCHED)
    assert nA >= 2 and nB >= 2, (nA, nB)
    A_REFS = {"qkv": qkv_w_ref, "o": o_w_ref, "gu": gu_w_ref}
    A_SCALES = {"qkv": qkv_s_ref, "o": o_s_ref, "gu": gu_s_ref}

    def startA(seq, layer):
        stage, j = A_SCHED[seq]
        pltpu.make_async_copy(
            A_REFS[stage].at[layer, :, pl.ds(j * NC, NC)],
            wA_ref.at[seq % 2],
            semA.at[seq % 2],
        ).start()

    def waitA(seq, layer):
        stage, j = A_SCHED[seq]
        pltpu.make_async_copy(
            A_REFS[stage].at[layer, :, pl.ds(j * NC, NC)],
            wA_ref.at[seq % 2],
            semA.at[seq % 2],
        ).wait()

    def startB(j, layer):
        pltpu.make_async_copy(
            dn_w_ref.at[layer, :, pl.ds(j * NC, NC)],
            wB_ref.at[j % 2],
            semB.at[j % 2],
        ).start()

    def waitB(j, layer):
        pltpu.make_async_copy(
            dn_w_ref.at[layer, :, pl.ds(j * NC, NC)],
            wB_ref.at[j % 2],
            semB.at[j % 2],
        ).wait()

    # after computing A-chunk ``seq`` (or B-chunk nA+j), kick the DMA two
    # slots ahead in the global schedule — the slot just freed
    def kick(seq):
        nxt = seq + 2
        if nxt < nA:
            startA(nxt, l_id)
        elif nxt < nA + 2:
            startB(nxt - nA, l_id)

    def kickB(j):
        nxt = j + 2
        if nxt < nB:
            startB(nxt, l_id)
        else:
            a = nxt - nB
            if a < 2:
                @pl.when(l_id + 1 < L)
                def _():
                    startA(a, l_id + 1)

    # ---- first grid step: prime the pipeline + clear padding ------------
    @pl.when(l_id == 0)
    def _():
        h_ref[:] = x_ref[:]
        xq_ref[:] = jnp.zeros_like(xq_ref)
        startA(0, 0)
        startA(1, 0)

    # ---- attention chunk DMAs (cache streaming) -------------------------
    lens = [lens_ref[i] for i in range(b)]
    maxlen = lens[0]
    for i in range(1, b):
        maxlen = jnp.maximum(maxlen, lens[i])
    nb = (maxlen + BK - 1) // BK  # dynamic

    def att_start(kb_idx, slot):
        pltpu.make_async_copy(
            kq_hbm.at[l_id, :, :, :, pl.ds(kb_idx * BK, BK)],
            kbuf_ref.at[slot], sematt.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            ks_hbm.at[l_id, :, pl.ds(kb_idx * BK, BK)],
            ksb_ref.at[slot], sematt.at[slot, 1],
        ).start()
        pltpu.make_async_copy(
            vq_hbm.at[l_id, :, :, pl.ds(kb_idx * BK, BK), :],
            vbuf_ref.at[slot], sematt.at[slot, 2],
        ).start()
        pltpu.make_async_copy(
            vs_hbm.at[l_id, :, pl.ds(kb_idx * BK, BK)],
            vsb_ref.at[slot], sematt.at[slot, 3],
        ).start()

    def att_wait(kb_idx, slot):
        pltpu.make_async_copy(
            kq_hbm.at[l_id, :, :, :, pl.ds(kb_idx * BK, BK)],
            kbuf_ref.at[slot], sematt.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            ks_hbm.at[l_id, :, pl.ds(kb_idx * BK, BK)],
            ksb_ref.at[slot], sematt.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            vq_hbm.at[l_id, :, :, pl.ds(kb_idx * BK, BK), :],
            vbuf_ref.at[slot], sematt.at[slot, 2],
        ).wait()
        pltpu.make_async_copy(
            vs_hbm.at[l_id, :, pl.ds(kb_idx * BK, BK)],
            vsb_ref.at[slot], sematt.at[slot, 3],
        ).wait()

    @pl.when(nb > 0)
    def _():
        att_start(0, 0)
    if S // BK > 1:  # static: a second block exists at all
        @pl.when(nb > 1)
        def _():
            att_start(1, 1)

    # ---- activation quantization helper ---------------------------------
    def quantize_act(vals, K):
        """vals [b, K] (dtype) -> xq_ref[:b, :K] int8; returns sx [b,1] f32
        (quant_matmul.quantize_per_token semantics)."""
        vf = vals.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
        sx = a_qmax / (absmax + _EPS)
        xq_ref[0:b, 0:K] = jnp.round(vf * sx).astype(jnp.int8)
        return sx

    def mm_chunk(K, w, sx, sw):
        """[BM,K]i8 @ [K,NC]i8 -> f32 [b, NC] with the int8 fixup."""
        acc = jax.lax.dot_general(
            xq_ref[:, 0:K], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc[0:b].astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))

    # =====================================================================
    # Stage 1: qkv projection
    # =====================================================================
    xn = llama.rms_norm(h_ref[:], anorm_ref[l_id], c.rms_norm_eps)
    sx = quantize_act(xn, H)
    for seq in range(nq):
        waitA(seq, l_id)
        sw = qkv_s_ref[l_id, :, pl.ds(seq * NC, NC)]       # [1, NC]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        qkv_ref[:, pl.ds(seq * NC, NC)] = out.astype(dtype)
        kick(seq)

    # ---- current-token K/V quantization + cache write -------------------
    q_dim = nh * hd
    kv_new = qkv_ref[:, q_dim:q_dim + kv_dim]              # [b, kv_dim]
    vv_new = qkv_ref[:, q_dim + kv_dim:]
    if not rope:
        # post-RoPE cache mode: rotate K at its absolute position BEFORE
        # quantizing (model._serving_layer's kv_cache_rope == "post")
        kh = kv_new.reshape(b, kvh, hd)
        kc = qcos_ref[:][:, None, :].astype(kh.dtype)      # [b, 1, h2]
        ks_ = qsin_ref[:][:, None, :].astype(kh.dtype)
        k1_, k2_ = kh[..., :h2], kh[..., h2:]
        kv_new = jnp.concatenate(
            [k1_ * kc - k2_ * ks_, k2_ * kc + k1_ * ks_], axis=-1
        ).reshape(b, kv_dim)
    kf = kv_new.astype(jnp.float32)
    vf = vv_new.astype(jnp.float32)
    ks_s = kv_qmax / (jnp.max(jnp.abs(kf), axis=-1, keepdims=True) + _EPS)
    vs_s = kv_qmax / (jnp.max(jnp.abs(vf), axis=-1, keepdims=True) + _EPS)
    k_int = jnp.round(kf * ks_s).astype(jnp.int8)          # [b, kv_dim]
    v_int = jnp.round(vf * vs_s).astype(jnp.int8)
    k_inv = 1.0 / (ks_s + _EPS)                            # [b, 1]
    v_inv = 1.0 / (vs_s + _EPS)
    # staging layouts: K transposed [kvh, hd, 1]; V [kvh, 1, hd]
    kst_ref[:] = k_int.reshape(b, kvh, hd)[..., None]
    vst_ref[:] = v_int.reshape(b, kvh, hd)[:, :, None, :]
    kss_ref[:] = k_inv
    vss_ref[:] = v_inv
    for i in range(b):
        wp = jnp.where(act_ref[i] != 0, lens_ref[i], S - 1)
        pltpu.make_async_copy(
            kst_ref.at[i], kq_out.at[l_id, i, :, :, pl.ds(wp, 1)],
            semwr.at[i, 0],
        ).start()
        pltpu.make_async_copy(
            kss_ref.at[i], ks_out.at[l_id, i, pl.ds(wp, 1)], semwr.at[i, 1]
        ).start()
        pltpu.make_async_copy(
            vst_ref.at[i], vq_out.at[l_id, i, :, pl.ds(wp, 1), :],
            semwr.at[i, 2],
        ).start()
        pltpu.make_async_copy(
            vss_ref.at[i], vs_out.at[l_id, i, pl.ds(wp, 1)], semwr.at[i, 3]
        ).start()

    # ---- query RoPE ------------------------------------------------------
    qv = qkv_ref[:, 0:q_dim].reshape(b, kvh, groups, hd)
    qc = qcos_ref[:][:, None, None, :].astype(dtype)       # [b,1,1,h2]
    qs = qsin_ref[:][:, None, None, :].astype(dtype)
    q1, q2 = qv[..., :h2], qv[..., h2:]
    qrot = jnp.concatenate([q1 * qc - q2 * qs, q2 * qc + q1 * qs], axis=-1)
    qrot_ref[:] = qrot.astype(ct).astype(jnp.float32)

    # =====================================================================
    # Stage 2: attention over the streamed int8 cache (online softmax)
    # =====================================================================
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def att_body(kb_idx, _):
        slot = jax.lax.rem(kb_idx, 2)
        att_wait(kb_idx, slot)
        start = kb_idx * BK
        if rope:
            cos = kcos_ref[:, pl.ds(start, BK)]
            sin = ksin_ref[:, pl.ds(start, BK)]
        col = start + jax.lax.broadcasted_iota(jnp.int32, (groups, BK), 1)
        for i in range(b):
            # a block past slot i's length contributes nothing — skipping it
            # also avoids the exp(-inf - -inf) = 1 poisoning of l for fully
            # masked blocks (mirrors the scan kernel's n_valid grid clamp)
            @pl.when(start < lens[i])
            def _(i=i):
                ksl = ksb_ref[slot, i][None, :]            # [1, BK] inv scl
                vsl = vsb_ref[slot, i][:, None]            # [BK, 1]
                valid = col < lens[i]
                if rope:
                    cc = (cos * ksl).astype(ct)            # [h2, BK]
                    ss = (sin * ksl).astype(ct)
                for hh in range(kvh):
                    kq_ih = kbuf_ref[slot, i, hh]          # [hd, BK] int8
                    if rope:
                        k1 = kq_ih[0:h2].astype(ct)
                        k2 = kq_ih[h2:hd].astype(ct)
                        kr = jnp.concatenate(
                            [k1 * cc - k2 * ss, k2 * cc + k1 * ss], axis=0
                        )
                    else:
                        kr = kq_ih.astype(ct) * ksl.astype(ct)
                    q_ih = qrot_ref[i, hh].astype(ct)      # [groups, hd]
                    s = jax.lax.dot_general(
                        q_ih, kr, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s = jnp.where(valid, s * scale, _NEG_INF)
                    m_prev = m_ref[i, hh]
                    l_prev = l_ref[i, hh]
                    m_blk = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_blk)
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    m_ref[i, hh] = m_new
                    l_ref[i, hh] = l_prev * alpha + jnp.sum(
                        p, axis=-1, keepdims=True
                    )
                    v_ih = (
                        vbuf_ref[slot, i, hh].astype(ct)
                        * vsl.astype(ct)
                    )                                      # [BK, hd]
                    acc_ref[i, hh] = (
                        acc_ref[i, hh] * alpha + jax.lax.dot_general(
                            p.astype(ct), v_ih, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
        @pl.when(kb_idx + 2 < nb)
        def _():
            att_start(kb_idx + 2, slot)
        return 0

    jax.lax.fori_loop(0, nb, att_body, 0)

    # ---- fold the current token as a final online-softmax pair ----------
    # (active slots only — inactive slots don't advance, matching the scan
    # path where new_len stays at seq_lens)
    if rope:
        ccur = (qcos_ref[:] * k_inv).astype(ct)            # [b, h2] — table
        scur = (qsin_ref[:] * k_inv).astype(ct)            # cos at pos len
        ki = k_int.reshape(b, kvh, hd)
        k1 = ki[..., :h2].astype(ct)
        k2 = ki[..., h2:].astype(ct)
        cb = ccur[:, None, :]
        sb = scur[:, None, :]
        k_fold = jnp.concatenate(
            [k1 * cb - k2 * sb, k2 * cb + k1 * sb], axis=-1
        ).astype(jnp.float32)                              # [b, kvh, hd]
    else:
        k_fold = (
            k_int.reshape(b, kvh, hd).astype(ct)
            * k_inv[:, :, None].astype(ct)
        ).astype(jnp.float32)
    v_fold = (
        v_int.reshape(b, kvh, hd).astype(ct)
        * v_inv[:, :, None].astype(ct)
    ).astype(jnp.float32)                                  # [b, kvh, hd]
    qf = qrot_ref[:]                                       # [b,kvh,g,hd] f32
    s_cur = jnp.sum(qf * k_fold[:, :, None, :], axis=-1, keepdims=True)
    s_cur = s_cur * scale
    active_col = (actv_ref[:] > 0.5).reshape(b, 1, 1, 1)
    s_cur = jnp.where(active_col, s_cur, _NEG_INF)
    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, s_cur)
    alpha = jnp.exp(m_prev - m_new)
    # zero (not exp(-inf - -inf) = 1) where the fold is inactive — the
    # token doesn't exist for that slot
    p = jnp.where(active_col, jnp.exp(s_cur - m_new), 0.0)
    l_new = l_prev * alpha + p
    acc = acc_ref[:] * alpha + p * v_fold[:, :, None, :]
    o = acc / jnp.maximum(l_new, 1e-9)
    attn_ref[:] = o.reshape(b, nh * hd).astype(dtype)

    # =====================================================================
    # Stage 3: o projection (+ residual)
    # =====================================================================
    sx = quantize_act(attn_ref[:], H)
    for j in range(no):
        seq = nq + j
        waitA(seq, l_id)
        sw = o_s_ref[l_id, :, pl.ds(j * NC, NC)]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        h_ref[:, pl.ds(j * NC, NC)] = (
            h_ref[:, pl.ds(j * NC, NC)] + out.astype(dtype)
        )
        kick(seq)

    # =====================================================================
    # Stage 4: gate/up projection
    # =====================================================================
    xn2 = llama.rms_norm(h_ref[:], mnorm_ref[l_id], c.rms_norm_eps)
    sx = quantize_act(xn2, H)
    for j in range(ngu):
        seq = nq + no + j
        waitA(seq, l_id)
        sw = gu_s_ref[l_id, :, pl.ds(j * NC, NC)]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        gu_ref[:, pl.ds(j * NC, NC)] = out.astype(dtype)
        kick(seq)

    # =====================================================================
    # Stage 5: down projection (+ residual)
    # =====================================================================
    gate = gu_ref[:, 0:I]
    up = gu_ref[:, I:]
    actv = jax.nn.silu(gate) * up                          # [b, I] dtype
    sx = quantize_act(actv, I)
    for j in range(nB):
        waitB(j, l_id)
        sw = dn_s_ref[l_id, :, pl.ds(j * NC, NC)]
        acc = jax.lax.dot_general(
            xq_ref[:, 0:I], wB_ref[j % 2], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc[0:b].astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))
        h_ref[:, pl.ds(j * NC, NC)] = (
            h_ref[:, pl.ds(j * NC, NC)] + out.astype(dtype)
        )
        kickB(j)

    # drain this layer's cache-write DMAs before the grid step ends
    for i in range(b):
        wp = jnp.where(act_ref[i] != 0, lens_ref[i], S - 1)
        pltpu.make_async_copy(
            kst_ref.at[i], kq_out.at[l_id, i, :, :, pl.ds(wp, 1)],
            semwr.at[i, 0],
        ).wait()
        pltpu.make_async_copy(
            kss_ref.at[i], ks_out.at[l_id, i, pl.ds(wp, 1)], semwr.at[i, 1]
        ).wait()
        pltpu.make_async_copy(
            vst_ref.at[i], vq_out.at[l_id, i, :, pl.ds(wp, 1), :],
            semwr.at[i, 2],
        ).wait()
        pltpu.make_async_copy(
            vss_ref.at[i], vs_out.at[l_id, i, pl.ds(wp, 1)], semwr.at[i, 3]
        ).wait()

    y_ref[:] = h_ref[:]


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def decode_step(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [b, 1]
    seq_lens: jax.Array,     # [b]
    active: jax.Array,       # [b] bool
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Megakernel decode step — same contract as model._forward at s=1."""
    c = config
    b, s = input_ids.shape
    assert s == 1, input_ids.shape
    k_q, k_s, v_q, v_s = cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"]
    L, _, kvh, hd, S = k_q.shape
    H = c.hidden_size
    I = c.intermediate_size
    Dq = H + 2 * kvh * hd
    NC = _pick_nc(c)
    BK = _pick_bk(S)
    BM = max(32, -(-b // 8) * 8)
    rope = c.kv_cache_rope != "post"

    h = jnp.take(qparams["embed"], input_ids[:, 0], axis=0).astype(dtype)
    positions = seq_lens[:, None]                          # [b, 1]
    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    qcos = qcos[:, 0, : hd // 2]                           # [b, hd/2] f32
    qsin = qsin[:, 0, : hd // 2]
    cache_pos = jnp.arange(S, dtype=jnp.int32)[None]
    kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
    kcos_t = kcos[0, :, : hd // 2].T                       # [hd/2, S]
    ksin_t = ksin[0, :, : hd // 2].T

    lay = qparams["layers"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qcos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qsin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # actv
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kcos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ksin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gu_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dn_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # anorm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mnorm
            pl.BlockSpec(memory_space=pl.ANY),    # qkv_w
            pl.BlockSpec(memory_space=pl.ANY),    # o_w
            pl.BlockSpec(memory_space=pl.ANY),    # gu_w
            pl.BlockSpec(memory_space=pl.ANY),    # dn_w
            pl.BlockSpec(memory_space=pl.ANY),    # k_q
            pl.BlockSpec(memory_space=pl.ANY),    # k_s
            pl.BlockSpec(memory_space=pl.ANY),    # v_q
            pl.BlockSpec(memory_space=pl.ANY),    # v_s
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # k_q
            pl.BlockSpec(memory_space=pl.ANY),    # k_s
            pl.BlockSpec(memory_space=pl.ANY),    # v_q
            pl.BlockSpec(memory_space=pl.ANY),    # v_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # y
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), dtype),               # h
            pltpu.VMEM((BM, max(H, I)), jnp.int8),   # xq
            pltpu.VMEM((b, Dq), dtype),              # qkv
            pltpu.VMEM((b, H), dtype),               # attn
            pltpu.VMEM((b, 2 * I), dtype),           # gu
            pltpu.VMEM((b, kvh, c.num_attention_heads // kvh, hd),
                       jnp.float32),                 # qrot
            pltpu.VMEM((b, kvh, c.num_attention_heads // kvh, 1),
                       jnp.float32),                 # m
            pltpu.VMEM((b, kvh, c.num_attention_heads // kvh, 1),
                       jnp.float32),                 # l
            pltpu.VMEM((b, kvh, c.num_attention_heads // kvh, hd),
                       jnp.float32),                 # acc
            pltpu.VMEM((b, kvh, hd, 1), jnp.int8),   # kst
            pltpu.VMEM((b, kvh, 1, hd), jnp.int8),   # vst
            pltpu.VMEM((b, 1), jnp.float32),         # kss
            pltpu.VMEM((b, 1), jnp.float32),         # vss
            pltpu.VMEM((2, H, NC), jnp.int8),        # wA
            pltpu.VMEM((2, I, NC), jnp.int8),        # wB
            pltpu.VMEM((2, b, kvh, hd, BK), jnp.int8),   # kbuf
            pltpu.VMEM((2, b, BK), jnp.float32),         # ksb
            pltpu.VMEM((2, b, kvh, BK, hd), jnp.int8),   # vbuf
            pltpu.VMEM((2, b, BK), jnp.float32),         # vsb
            pltpu.SemaphoreType.DMA((2,)),           # semA
            pltpu.SemaphoreType.DMA((2,)),           # semB
            pltpu.SemaphoreType.DMA((2, 4)),         # sematt
            pltpu.SemaphoreType.DMA((b, 4)),         # semwr
        ],
    )

    kernel = functools.partial(
        _kernel, cfg=c, b=b, BM=BM, NC=NC, BK=BK, rope=rope, dtype=dtype
    )
    out_shapes = [
        jax.ShapeDtypeStruct(k_q.shape, k_q.dtype),
        jax.ShapeDtypeStruct(k_s.shape, k_s.dtype),
        jax.ShapeDtypeStruct(v_q.shape, v_q.dtype),
        jax.ShapeDtypeStruct(v_s.shape, v_s.dtype),
        jax.ShapeDtypeStruct((b, H), dtype),
    ]
    # operand order: 2 scalar-prefetch + 19 tensors; cache operands are
    # inputs 17..20 in the FULL operand numbering (scalars included) and
    # alias outputs 0..3
    n_scalar = 2
    n_lead = 16  # x..dn_w tensor inputs before the cache block
    aliases = {n_scalar + n_lead + i: i for i in range(4)}

    k_q2, k_s2, v_q2, v_s2, y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=_interpret(),
    )(
        seq_lens.astype(jnp.int32), active.astype(jnp.int32),
        h, qcos, qsin, active.astype(jnp.float32)[:, None], kcos_t, ksin_t,
        lay["qkv"]["s"], lay["o"]["s"], lay["gateup"]["s"], lay["down"]["s"],
        jnp.asarray(lay["attn_norm"]), jnp.asarray(lay["mlp_norm"]),
        lay["qkv"]["q"], lay["o"]["q"], lay["gateup"]["q"], lay["down"]["q"],
        k_q, k_s, v_q, v_s,
    )

    hf = llama.rms_norm(y[:, None, :], qparams["final_norm"], c.rms_norm_eps)
    head = (
        qparams["embed"].T if "lm_head" not in qparams else qparams["lm_head"]
    )
    logits = jnp.matmul(
        hf, head.astype(hf.dtype), preferred_element_type=jnp.float32
    )
    new_len = jnp.where(active, seq_lens + 1, seq_lens)
    new_cache = {
        "k_q": k_q2, "k_s": k_s2, "v_q": v_q2, "v_s": v_s2,
        "lengths": new_len,
    }
    return logits, new_cache
