"""Fused quantized-KV decode attention — Pallas TPU kernel.

The serving decode step attends one new token per slot against the whole
int8 KV cache. The pure-XLA path (inference/model.py) dequantizes the full
cache to bf16 in HBM, applies RoPE to every cached key, and then attends —
~5 bytes of HBM traffic per cached element per layer per step. This kernel
reads the *int8* cache directly (1 byte/elem, the information floor),
dequantizes in VMEM, applies RoPE to keys in-kernel, and runs an online
softmax — nothing besides the int8 cache and the [b, nh, hd] query/output
ever touches HBM.

Layout (measured on v5e; see git history for the evolution):
  * K AND V are stored **transposed** — ``[b, kvh, hd, S]`` int8 — so the
    score contraction ``q [g, hd] x k [hd, bk]`` is the canonical MXU
    matmul (contract lhs dim 1 with rhs dim 0). The previous
    ``[b, kvh, S, hd]`` K layout forced Mosaic to transpose every K block
    in VMEM (dn (1,1)), ~40% of kernel time. V moved to the same layout in
    round 4: its p·V contraction runs transposed-rhs (contract (1,1) — the
    megakernel measured this fine), and one shared layout lets the whole-
    model megakernel stream V by DMA column slices instead of paying a
    per-step XLA transpose copy of the entire V cache (VERDICT r3 item 5).
  * K-RoPE cos/sin are **hoisted operands** (``[hd/2, S]`` f32, also
    transposed) computed once per forward by the caller; in-kernel
    transcendentals were the kernel's dominant cost (recomputed per
    slot x block: 2x slower end to end). An in-kernel fallback remains for
    standalone calls.
  * Each grid program handles one (slot, KV-block) pair across ALL kv heads
    so DMAs are hundreds of KB; per-slot lengths ride in scalar-prefetch
    SMEM and blocks past a slot's length are clamped in the index map
    (Pallas elides the refetch) and their compute skipped.

Numerics contract (matches inference/model.py / the training hook,
modeling_llama_quant.py:320-333): K/V quantized per-token pre-RoPE;
dequantize then RoPE by absolute cache position; fp32 softmax. With
``rope=False`` (config.kv_cache_rope == "post") the cache already holds
rotated-K integers and the kernel only dequantizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _decode_attn_kernel(
    # scalar prefetch (act_ref present only when fold)
    lens_ref,                      # [b] int32 in SMEM
    # inputs (cos_ref/sin_ref present only when rope and tables; the
    # fold refs only when fold):
    #   q_ref   [1, kvh, groups, hd]
    #   kq_ref  [1, kvh, hd, bk] int8 (transposed K)
    #   ks_ref  [1, 1, bk] f32 (inverse scales, lane-major)
    #   vq_ref  [1, kvh, hd, bk] int8 (transposed, same layout as K)
    #   vs_ref  [1, 1, bk] f32
    #   cos_ref/sin_ref [hd/2, bk] f32 — hoisted RoPE tables (transposed)
    #   knew_ref [1, kvh, hd] int8 — current token's quantized K (unpacked)
    #   kinv_ref [1, 1] f32 — its per-token inverse scale
    #   vnew_ref [1, kvh, hd] int8, vinv_ref [1, 1] f32
    #   qc_ref/qs_ref [1, hd/2] f32 — cos/sin at the slot's position
    # outputs: o_ref [1, kvh, groups, hd]
    # scratch: m_ref/l_ref [kvh, groups, 1] f32, acc_ref [kvh, groups, hd]
    *refs,
    bk: int,
    scale: float,
    theta: float,
    rope: bool = True,
    tables: bool = False,
    packed: bool = False,
    fold: bool = False,
):
    refs = list(refs)
    if fold:
        act_ref = refs.pop(0)
    q_ref, kq_ref, ks_ref, vq_ref, vs_ref = refs[:5]
    rest = refs[5:]
    if rope and tables:
        cos_ref, sin_ref = rest[:2]
        rest = rest[2:]
    if fold:
        knew_ref, kinv_ref, vnew_ref, vinv_ref = rest[:4]
        rest = rest[4:]
        if rope:
            qc_ref, qs_ref = rest[:2]
            rest = rest[2:]
    o_ref, m_ref, l_ref, acc_ref = rest

    ib = pl.program_id(0)
    kb = pl.program_id(1)
    length = lens_ref[ib]
    n_valid = (length + bk - 1) // bk

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # kb*bk < length (not kb < n_valid): with fold the cache may be EMPTY
    # (length 0, first decode of a fresh slot) — the block must be skipped
    # entirely or its fully-masked s == _NEG_INF rows poison l with
    # exp(0) = 1 per masked column
    @pl.when(kb * bk < length)
    def _():
        kvh, groups, hd = q_ref.shape[1:]
        h2 = hd // 2
        start = kb * bk
        ct = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

        ks = ks_ref[0]                                     # [1, bk]
        kq = kq_ref[0]                                     # [kvh, hd(/2), bk]
        if packed:
            # KV4 nibble-packed cache (model.cache_is_packed): the byte's
            # nibbles ARE the split-half hd rows the RoPE math wants —
            # unpack is two shifts, no relayout
            pi = kq.astype(jnp.int32)
            k1_i = ((pi << 28) >> 28).astype(jnp.int8)     # rows 0..h2-1
            k2_i = ((pi << 24) >> 28).astype(jnp.int8)     # rows h2..hd-1
        if rope:
            if tables:
                # hoisted tables: transcendentals computed once per forward
                # by the caller, not per (slot, block) program
                cos = cos_ref[...]                         # [hd/2, bk]
                sin = sin_ref[...]
            else:
                pos = (
                    start + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                ).astype(jnp.float32)                      # [1, bk]
                # RoPE tables (LlamaRotaryEmbedding: inv_freq = theta^(-2i/d))
                inv_freq = jnp.exp(
                    jax.lax.broadcasted_iota(jnp.int32, (h2, 1), 0).astype(
                        jnp.float32
                    )
                    * (-2.0 / hd)
                    * jnp.log(jnp.float32(theta))
                )                                          # [hd/2, 1]
                freqs = inv_freq * pos                     # [hd/2, bk]
                cos = jnp.cos(freqs)
                sin = jnp.sin(freqs)
            # fold the per-token inverse scale into the RoPE coefficients so
            # dequant + rotation is 4 mul + 2 add per element pair
            cc = (cos * ks).astype(ct)[None]               # [1, hd/2, bk]
            ss = (sin * ks).astype(ct)[None]
            if packed:
                k1 = k1_i.astype(ct)                       # [kvh, hd/2, bk]
                k2 = k2_i.astype(ct)
            else:
                k1 = kq[:, :h2].astype(ct)                 # [kvh, hd/2, bk]
                k2 = kq[:, h2:].astype(ct)
            # rotate-half: [k1*c - k2*s ; k2*c + k1*s], assembled along the
            # sublane (hd) dim so the score matmul is ONE canonical dot
            kr = jnp.concatenate([k1 * cc - k2 * ss, k2 * cc + k1 * ss],
                                 axis=1)                   # [kvh, hd, bk]
        else:
            # post-RoPE cache (config.kv_cache_rope == "post"): integers are
            # already rotated; just dequantize
            sk = ks.astype(ct)[None]
            if packed:
                kr = jnp.concatenate(
                    [k1_i.astype(ct) * sk, k2_i.astype(ct) * sk], axis=1
                )
            else:
                kr = kq.astype(ct) * sk
        vq = vq_ref[0]                                     # [kvh, hd(/2), bk]
        if packed:
            vp = vq.astype(jnp.int32)
            vq = jnp.concatenate(
                [
                    ((vp << 28) >> 28).astype(jnp.int8),
                    ((vp << 24) >> 28).astype(jnp.int8),
                ],
                axis=1,
            )
        v = vq.astype(ct)                                  # [kvh, hd, bk]
        # per-token V inverse scale rides the lane dim; fold it into p
        # (groups*bk muls) instead of dequantizing v (kvh*hd*bk muls)
        vs = vs_ref[0].astype(ct)                          # [1, bk]

        col = start + jax.lax.broadcasted_iota(jnp.int32, (groups, bk), 1)
        valid = col < length

        m_prev, l_prev = m_ref[:], l_ref[:]
        # per-kv-head MXU dots (unrolled; kvh is static); q [g, hd] x
        # kr [hd, bk] contracts (1,0) — the canonical layout, no transpose
        for h in range(kvh):
            q = q_ref[0, h].astype(ct)                     # [groups, hd]
            s = jax.lax.dot_general(
                q, kr[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [groups, bk]
            s = jnp.where(valid, s * scale, _NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev[h], m_blk)
            alpha = jnp.exp(m_prev[h] - m_new)
            p = jnp.exp(s - m_new)
            m_ref[h] = m_new
            l_ref[h] = l_prev[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                (p * vs).astype(ct), v[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kb == jnp.maximum(n_valid - 1, 0))
    def _():
        if fold:
            # fold the CURRENT token's (K, V) as one extra online-softmax
            # pair — the cache stays read-only and the caller commits the
            # integers post-scan (megakernel.py's fold, ported so the scan
            # serving path stops rewriting the whole cache every step).
            # Slots with act == 0 (inactive) exclude the pair.
            kvh, groups, hd = q_ref.shape[1:]
            h2 = hd // 2
            ct = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
            inc = act_ref[ib] != 0
            kinv = kinv_ref[0]                             # [1, 1] f32
            vinv = vinv_ref[0].astype(ct)
            if rope:
                cc_i = (qc_ref[0] * kinv).astype(ct)       # [1, h2]
                ss_i = (qs_ref[0] * kinv).astype(ct)
            for h in range(kvh):
                kih = knew_ref[0, h:h + 1, :]              # [1, hd] int8
                if rope:
                    k1 = kih[:, :h2].astype(ct)
                    k2 = kih[:, h2:].astype(ct)
                    k_fold = jnp.concatenate(
                        [k1 * cc_i - k2 * ss_i, k2 * cc_i + k1 * ss_i],
                        axis=-1,
                    ).astype(jnp.float32)                  # [1, hd]
                else:
                    k_fold = (kih.astype(ct) * kinv.astype(ct)).astype(
                        jnp.float32
                    )
                v_fold = (
                    vnew_ref[0, h:h + 1, :].astype(ct) * vinv
                ).astype(jnp.float32)                      # [1, hd]
                qf = q_ref[0, h].astype(jnp.float32)       # [groups, hd]
                s_cur = jax.lax.dot_general(
                    qf, k_fold, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                  # [groups, 1]
                s_cur = jnp.where(inc, s_cur, _NEG_INF)
                m_prev = m_ref[h]
                l_prev = l_ref[h]
                m_new = jnp.maximum(m_prev, s_cur)
                alpha = jnp.exp(m_prev - m_new)
                # zero (not exp(-NEG_INF - -NEG_INF) = 1) where inactive —
                # the token doesn't exist for that slot
                p = jnp.where(inc, jnp.exp(s_cur - m_new), 0.0)
                m_ref[h] = m_new
                l_ref[h] = l_prev * alpha + p
                acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                    p, v_fold, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        l = jnp.maximum(l_ref[:], 1e-9)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _pick_bk(S: int, kvh: int, hd: int, bk: int) -> int:
    """Cap the block so the f32 dequant working set stays VMEM-friendly
    (~4 MB for K+V), then round down to a divisor of S aligned to 8."""
    cap = max(2 ** 20 // (kvh * hd), 8)      # ~6 MB bf16+int8 working set
    bk = min(bk, cap, S)
    while S % bk or bk % 8:
        bk -= 8
        if bk <= 8:
            return 8
    return bk


@functools.partial(jax.jit, static_argnames=("bk", "theta", "rope", "packed"))
def quantized_decode_attention(
    q: jax.Array,        # [b, nh, hd] — post-RoPE query for the new token
    k_q: jax.Array,      # [b, kvh, hd, S] int8 — TRANSPOSED pre-RoPE K
    k_s: jax.Array,      # [b, S] f32 per-token inverse scales
    v_q: jax.Array,      # [b, kvh, hd, S] int8 — TRANSPOSED (K's layout)
    v_s: jax.Array,      # [b, S] f32
    lengths: jax.Array,  # [b] int32 — positions < length attend
    k_cos: jax.Array = None,  # [hd/2, S] f32 hoisted RoPE tables (pre mode);
    k_sin: jax.Array = None,  # None => compute cos/sin in-kernel (slower)
    fold=None,           # optional current-token pair folded IN-KERNEL so
                         # the cache stays read-only: (k_new [b,kvh,hd] i8,
                         # k_inv [b,1] f32, v_new, v_inv, active [b],
                         # q_cos [b,hd/2], q_sin [b,hd/2]); with fold,
                         # ``lengths`` is the PRE-append length (may be 0)
    *,
    theta: float = 10000.0,
    bk: int = 1024,
    rope: bool = True,   # False => cache already holds rotated K (post mode)
    packed: bool = False,  # KV4 nibble-packed cache: hd split-half per byte
) -> jax.Array:          # [b, nh, hd]
    b, nh, hd = q.shape
    kvh, S = k_q.shape[1], k_q.shape[3]
    groups = nh // kvh
    hdc = hd // 2 if packed else hd   # cache's stored head-dim extent
    assert nh == kvh * groups, (q.shape, k_q.shape)
    assert k_q.shape[2] == hdc, ("K must be transposed [b,kvh,hd,S]", k_q.shape)
    assert v_q.shape == k_q.shape, ("V must share K's transposed layout",
                                    v_q.shape, k_q.shape)
    bk = _pick_bk(S, kvh, hd, bk)
    scale = 1.0 / (hd ** 0.5)
    tables = rope and k_cos is not None
    do_fold = fold is not None

    def clamp(kb, length):
        nv = jnp.maximum((length + bk - 1) // bk, 1)
        return jnp.minimum(kb, nv - 1)

    def kvmap(ib, kb, lens, *_):
        return (ib, 0, 0, clamp(kb, lens[ib]))

    def smap(ib, kb, lens, *_):
        return (ib, 0, clamp(kb, lens[ib]))

    def bmap(ib, kb, *_):
        return (ib, 0, 0)

    in_specs = [
        pl.BlockSpec((1, kvh, groups, hd), lambda ib, kb, *_: (ib, 0, 0, 0)),
        pl.BlockSpec((1, kvh, hdc, bk), kvmap),
        pl.BlockSpec((1, 1, bk), smap),
        pl.BlockSpec((1, kvh, hdc, bk), kvmap),
        pl.BlockSpec((1, 1, bk), smap),
    ]
    prefetch = [lengths]
    operands = [
        q.reshape(b, kvh, groups, hd),
        k_q,
        k_s[:, None, :],
        v_q,
        v_s[:, None, :],
    ]
    if tables:
        tspec = pl.BlockSpec(
            (hd // 2, bk), lambda ib, kb, lens, *_: (0, clamp(kb, lens[ib]))
        )
        in_specs += [tspec, tspec]
        operands += [k_cos.astype(jnp.float32), k_sin.astype(jnp.float32)]
    if do_fold:
        k_new, k_inv, v_new, v_inv, active, q_cos, q_sin = fold
        prefetch.append(active.astype(jnp.int32))
        # scalarish per-slot operands ride with a unit leading dim so the
        # block's last two dims equal the array's (Mosaic tiling rule)
        in_specs += [
            pl.BlockSpec((1, kvh, hd), lambda ib, kb, *_: (ib, 0, 0)),
            pl.BlockSpec((1, 1, 1), bmap),
            pl.BlockSpec((1, kvh, hd), lambda ib, kb, *_: (ib, 0, 0)),
            pl.BlockSpec((1, 1, 1), bmap),
        ]
        operands += [
            k_new.reshape(b, kvh, hd),
            k_inv.reshape(b, 1, 1).astype(jnp.float32),
            v_new.reshape(b, kvh, hd),
            v_inv.reshape(b, 1, 1).astype(jnp.float32),
        ]
        if rope:
            in_specs += [
                pl.BlockSpec((1, 1, hd // 2), bmap),
                pl.BlockSpec((1, 1, hd // 2), bmap),
            ]
            operands += [
                q_cos.reshape(b, 1, hd // 2).astype(jnp.float32),
                q_sin.reshape(b, 1, hd // 2).astype(jnp.float32),
            ]

    grid = (b, S // bk)
    out = pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, bk=bk, scale=scale, theta=float(theta),
            rope=rope, tables=tables, packed=packed, fold=do_fold,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, kvh, groups, hd), lambda ib, kb, *_: (ib, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, groups, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*prefetch, *operands)
    return out.reshape(b, nh, hd)


def _decode_attn_stacked_kernel(
    # scalar prefetch: lens_ref [b] int32, inc_ref [b] int32 (fold new pair?)
    # inputs:
    #   q_ref   [1, kvh, groups, hd]
    #   kq_ref  [1, 1, kvh, hd, bk] int8 — layer-indexed block of the STACK
    #   ks_ref  [1, 1, 1, bk] f32
    #   vq_ref  [1, 1, kvh, hd, bk] int8 (transposed, K's layout)
    #   vs_ref  [1, 1, 1, bk] f32
    #   kn_ref  [1, kvh, 1, hd] — current token's K (rotated fake-quant)
    #   vn_ref  [1, kvh, 1, hd] — current token's V (fake-quant)
    #   cos_ref/sin_ref [hd/2, bk] f32 (only when rope and tables)
    # outputs: o_ref [1, kvh, groups, hd]; scratch m/l [kvh, g, 1], acc
    *refs,
    bk: int,
    scale: float,
    theta: float,
    rope: bool = True,
    tables: bool = False,
):
    if rope and tables:
        (lens_ref, inc_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
         kn_ref, vn_ref, cos_ref, sin_ref,
         o_ref, m_ref, l_ref, acc_ref) = refs
    else:
        (lens_ref, inc_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
         kn_ref, vn_ref, o_ref, m_ref, l_ref, acc_ref) = refs

    ib = pl.program_id(0)
    kb = pl.program_id(1)
    length = lens_ref[ib]
    n_valid = (length + bk - 1) // bk
    kvh, groups, hd = q_ref.shape[1:]
    h2 = hd // 2
    ct = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kb < n_valid)
    def _():
        # identical block math to _decode_attn_kernel, reading the stacked
        # cache block (leading layer+batch singleton dims)
        start = kb * bk
        ks = ks_ref[0, 0]                                  # [1, bk]
        kq = kq_ref[0, 0]                                  # [kvh, hd, bk] i8
        if rope:
            if tables:
                cos = cos_ref[...]
                sin = sin_ref[...]
            else:
                pos = (
                    start + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                ).astype(jnp.float32)
                inv_freq = jnp.exp(
                    jax.lax.broadcasted_iota(jnp.int32, (h2, 1), 0).astype(
                        jnp.float32
                    )
                    * (-2.0 / hd)
                    * jnp.log(jnp.float32(theta))
                )
                freqs = inv_freq * pos
                cos = jnp.cos(freqs)
                sin = jnp.sin(freqs)
            cc = (cos * ks).astype(ct)[None]
            ss = (sin * ks).astype(ct)[None]
            k1 = kq[:, :h2].astype(ct)
            k2 = kq[:, h2:].astype(ct)
            kr = jnp.concatenate([k1 * cc - k2 * ss, k2 * cc + k1 * ss],
                                 axis=1)                   # [kvh, hd, bk]
        else:
            kr = kq.astype(ct) * ks.astype(ct)[None]
        v = vq_ref[0, 0].astype(ct)                        # [kvh, hd, bk]
        vs = vs_ref[0, 0].astype(ct)                       # [1, bk]

        col = start + jax.lax.broadcasted_iota(jnp.int32, (groups, bk), 1)
        valid = col < length

        m_prev, l_prev = m_ref[:], l_ref[:]
        for h in range(kvh):
            q = q_ref[0, h].astype(ct)                     # [groups, hd]
            s = jax.lax.dot_general(
                q, kr[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.where(valid, s * scale, _NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev[h], m_blk)
            alpha = jnp.exp(m_prev[h] - m_new)
            p = jnp.exp(s - m_new)
            m_ref[h] = m_new
            l_ref[h] = l_prev[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                (p * vs).astype(ct), v[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kb == jnp.maximum(n_valid - 1, 0))
    def _():
        # fold the CURRENT token's (K, V) as one extra online-softmax pair —
        # the cache stays read-only; its row is written once, post-loop, by
        # the caller. Slots with inc == 0 (inactive)
        # exclude the pair.
        inc = inc_ref[ib] > 0
        for h in range(kvh):
            q = q_ref[0, h].astype(ct)                     # [groups, hd]
            kn = kn_ref[0, h].astype(ct)                   # [1, hd]
            s = jax.lax.dot_general(
                q, kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [groups, 1]
            s = jnp.where(inc, s * scale, _NEG_INF)
            m_prev, l_prev = m_ref[h], l_ref[h]
            m_new = jnp.maximum(m_prev, s)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)                         # [groups, 1]
            l = l_prev * alpha + p
            acc = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(ct), vn_ref[0, h].astype(ct),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [groups, hd]
            l = jnp.maximum(l, 1e-9)
            o_ref[0, h] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("layer", "bk", "theta", "rope")
)
def quantized_decode_attention_stacked(
    q: jax.Array,        # [b, nh, hd] — post-RoPE query for the new token
    k_q_all: jax.Array,  # [L, b, kvh, hd, S] int8 — WHOLE stacked cache
    k_s_all: jax.Array,  # [L, b, S] f32
    v_q_all: jax.Array,  # [L, b, kvh, hd, S] int8 — TRANSPOSED (K's layout)
    v_s_all: jax.Array,  # [L, b, S] f32
    lengths: jax.Array,  # [b] int32 — valid OLD rows (current token excluded)
    include_new: jax.Array,  # [b] int32 — fold the current token's pair?
    k_new: jax.Array,    # [b, kvh, hd] — current K: fake-quant, rotated
    v_new: jax.Array,    # [b, kvh, hd] — current V: fake-quant
    k_cos: jax.Array = None,  # [hd/2, S] hoisted RoPE tables (pre mode)
    k_sin: jax.Array = None,
    *,
    layer: int,
    theta: float = 10000.0,
    bk: int = 1024,
    rope: bool = True,
) -> jax.Array:          # [b, nh, hd]
    """`quantized_decode_attention` over layer ``layer`` of the STACKED
    cache, selected statically in the index maps (no XLA slice, no HBM copy
    — see DESIGN.md "Decode speed-of-light study"). The cache is read-only:
    the current token's K/V enter as one extra in-kernel online-softmax
    pair, and the caller commits all layers' rows in one post-loop write."""
    b, nh, hd = q.shape
    L, _, kvh, _, S = k_q_all.shape
    groups = nh // kvh
    assert nh == kvh * groups, (q.shape, k_q_all.shape)
    assert k_q_all.shape[3] == hd and 0 <= layer < L, (k_q_all.shape, layer)
    assert v_q_all.shape == k_q_all.shape, ("V must share K's transposed "
                                            "layout", v_q_all.shape)
    bk = _pick_bk(S, kvh, hd, bk)
    scale = 1.0 / (hd ** 0.5)
    tables = rope and k_cos is not None

    def clamp(kb, length):
        nv = jnp.maximum((length + bk - 1) // bk, 1)
        return jnp.minimum(kb, nv - 1)

    in_specs = [
        pl.BlockSpec(
            (1, kvh, groups, hd), lambda ib, kb, lens, inc: (ib, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, kvh, hd, bk),
            lambda ib, kb, lens, inc: (layer, ib, 0, 0, clamp(kb, lens[ib])),
        ),
        pl.BlockSpec(
            (1, 1, 1, bk),
            lambda ib, kb, lens, inc: (layer, ib, 0, clamp(kb, lens[ib])),
        ),
        pl.BlockSpec(
            (1, 1, kvh, hd, bk),
            lambda ib, kb, lens, inc: (layer, ib, 0, 0, clamp(kb, lens[ib])),
        ),
        pl.BlockSpec(
            (1, 1, 1, bk),
            lambda ib, kb, lens, inc: (layer, ib, 0, clamp(kb, lens[ib])),
        ),
        pl.BlockSpec(
            (1, kvh, 1, hd), lambda ib, kb, lens, inc: (ib, 0, 0, 0)
        ),
        pl.BlockSpec(
            (1, kvh, 1, hd), lambda ib, kb, lens, inc: (ib, 0, 0, 0)
        ),
    ]
    operands = [
        lengths,
        include_new.astype(jnp.int32),
        q.reshape(b, kvh, groups, hd),
        k_q_all,
        k_s_all.reshape(L, b, 1, S),
        v_q_all,
        v_s_all.reshape(L, b, 1, S),
        k_new[:, :, None, :],
        v_new[:, :, None, :],
    ]
    if tables:
        tspec = pl.BlockSpec(
            (hd // 2, bk),
            lambda ib, kb, lens, inc: (0, clamp(kb, lens[ib])),
        )
        in_specs += [tspec, tspec]
        operands += [k_cos.astype(jnp.float32), k_sin.astype(jnp.float32)]

    grid = (b, S // bk)
    out = pl.pallas_call(
        functools.partial(
            _decode_attn_stacked_kernel, bk=bk, scale=scale,
            theta=float(theta), rope=rope, tables=tables,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, kvh, groups, hd), lambda ib, kb, lens, inc: (ib, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, groups, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*operands)
    return out.reshape(b, nh, hd)


def _paged_attn_kernel(lens_ref, bt_ref, *rest, **kw):
    # block-table indirection happens entirely in the index maps; the body
    # only needs lengths (+ the fold active mask when folding)
    _decode_attn_kernel(lens_ref, *rest, **kw)


def _paged_attn_kernel_fold(lens_ref, bt_ref, act_ref, *rest, **kw):
    _decode_attn_kernel(lens_ref, act_ref, *rest, **kw)


@functools.partial(jax.jit, static_argnames=("theta", "rope", "packed"))
def quantized_paged_attention(
    q: jax.Array,             # [b, nh, hd] — post-RoPE query
    k_q: jax.Array,           # [n_pages, kvh, hd(/2), P] int — TRANSPOSED K
    k_s: jax.Array,           # [n_pages, P] f32 per-token inverse scales
    v_q: jax.Array,           # [n_pages, kvh, hd(/2), P] int — TRANSPOSED
    v_s: jax.Array,           # [n_pages, P] f32
    lengths: jax.Array,       # [b] int32
    block_tables: jax.Array,  # [b, max_pages] int32 — logical page -> pool id
    k_cos: jax.Array = None,  # [hd/2, max_pages*P] f32 hoisted RoPE tables
    k_sin: jax.Array = None,  # (logical positions); None => in-kernel cos/sin
    fold=None,                # optional current-token pair folded IN-KERNEL
                              # (same tuple contract as
                              # quantized_decode_attention: k_new [b,kvh,hd]
                              # i8, k_inv [b,1] f32, v_new, v_inv,
                              # active [b], q_cos [b,hd/2], q_sin);
                              # with fold, ``lengths`` is PRE-append and the
                              # pool is READ-ONLY
    *,
    theta: float = 10000.0,
    rope: bool = True,
    packed: bool = False,     # KV4 nibble-packed pool: hd split-half per byte
) -> jax.Array:               # [b, nh, hd]
    """Paged-attention analog of `quantized_decode_attention`: the grid's KV
    dimension walks each slot's block table (scalar-prefetched), so pages
    stream from the shared pool with no gather materialization. Logical
    position of page ``pg`` row ``j`` is ``pg*P + j`` (RoPE + causal mask use
    logical positions); pages past ``ceil(len/P)`` are clamped in the index
    map and skipped."""
    b, nh, hd = q.shape
    n_pages, kvh, _, P = k_q.shape
    max_pages = block_tables.shape[1]
    groups = nh // kvh
    hdc = hd // 2 if packed else hd   # pool's stored head-dim extent
    assert nh == kvh * groups, (q.shape, k_q.shape)
    assert k_q.shape[2] == hdc, ("K must be transposed [np,kvh,hd,P]", k_q.shape)
    assert v_q.shape == k_q.shape, ("V must share K's transposed layout",
                                    v_q.shape, k_q.shape)
    scale = 1.0 / (hd ** 0.5)
    tables = rope and k_cos is not None

    do_fold = fold is not None

    def logical_clamp(ib, pg, lens):
        nv = jnp.maximum((lens[ib] + P - 1) // P, 1)
        return jnp.minimum(pg, nv - 1)

    def page_of(ib, pg, lens, bt, *_):
        # SMEM allows scalar loads only (real-TPU lowering rule): index the
        # block table at [ib, pg'] directly rather than slicing row ib
        return bt[ib, logical_clamp(ib, pg, lens)]

    in_specs = [
        pl.BlockSpec(
            (1, kvh, groups, hd),
            lambda ib, pg, *_: (ib, 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, kvh, hdc, P),
            lambda ib, pg, lens, bt, *_: (page_of(ib, pg, lens, bt), 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, P),
            lambda ib, pg, lens, bt, *_: (page_of(ib, pg, lens, bt), 0, 0),
        ),
        pl.BlockSpec(
            (1, kvh, hdc, P),
            lambda ib, pg, lens, bt, *_: (page_of(ib, pg, lens, bt), 0, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, P),
            lambda ib, pg, lens, bt, *_: (page_of(ib, pg, lens, bt), 0, 0),
        ),
    ]
    prefetch = [lengths, block_tables]
    operands = [
        q.reshape(b, kvh, groups, hd),
        k_q,
        k_s[:, None, :],
        v_q,
        v_s[:, None, :],
    ]
    if tables:
        # tables live at LOGICAL positions: block index is the clamped
        # logical page (consistent with the K block's skip/clamp)
        tspec = pl.BlockSpec(
            (hd // 2, P),
            lambda ib, pg, lens, bt, *_: (0, logical_clamp(ib, pg, lens)),
        )
        in_specs += [tspec, tspec]
        operands += [k_cos.astype(jnp.float32), k_sin.astype(jnp.float32)]
    if do_fold:
        k_new, k_inv, v_new, v_inv, active, q_cos, q_sin = fold
        prefetch.append(active.astype(jnp.int32))

        def bmap(ib, pg, *_):
            return (ib, 0, 0)

        in_specs += [
            pl.BlockSpec((1, kvh, hd), lambda ib, pg, *_: (ib, 0, 0)),
            pl.BlockSpec((1, 1, 1), bmap),
            pl.BlockSpec((1, kvh, hd), lambda ib, pg, *_: (ib, 0, 0)),
            pl.BlockSpec((1, 1, 1), bmap),
        ]
        operands += [
            k_new.reshape(b, kvh, hd),
            k_inv.reshape(b, 1, 1).astype(jnp.float32),
            v_new.reshape(b, kvh, hd),
            v_inv.reshape(b, 1, 1).astype(jnp.float32),
        ]
        if rope:
            in_specs += [
                pl.BlockSpec((1, 1, hd // 2), bmap),
                pl.BlockSpec((1, 1, hd // 2), bmap),
            ]
            operands += [
                q_cos.reshape(b, 1, hd // 2).astype(jnp.float32),
                q_sin.reshape(b, 1, hd // 2).astype(jnp.float32),
            ]

    grid = (b, max_pages)
    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel_fold if do_fold else _paged_attn_kernel,
            bk=P, scale=scale, theta=float(theta),
            rope=rope, tables=tables, packed=packed, fold=do_fold,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(prefetch),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, kvh, groups, hd), lambda ib, pg, *_: (ib, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, groups, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*prefetch, *operands)
    return out.reshape(b, nh, hd)


def decode_attention_reference(
    q, k_q, k_s, v_q, v_s, lengths, *, theta: float = 10000.0
) -> jax.Array:
    """Pure-XLA oracle with identical semantics (f32 throughout), for tests.
    Takes the UNtransposed K layout ``[b, kvh, S, hd]``."""
    b, nh, hd = q.shape
    kvh, S = k_q.shape[1], k_q.shape[2]
    groups = nh // kvh

    kd = k_q.astype(jnp.float32) * k_s[:, None, :, None]   # [b, kvh, S, hd]
    vd = v_q.astype(jnp.float32) * v_s[:, None, :, None]

    pos = jnp.arange(S, dtype=jnp.float32)
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = pos[:, None] * inv_freq[None, :]               # [S, hd/2]
    cos = jnp.concatenate([jnp.cos(freqs)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(freqs)] * 2, axis=-1)
    k1, k2 = kd[..., : hd // 2], kd[..., hd // 2 :]
    rot = jnp.concatenate([-k2, k1], axis=-1)
    kd = kd * cos[None, None] + rot * sin[None, None]

    qg = q.reshape(b, kvh, groups, hd).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd) / (hd ** 0.5)
    valid = jnp.arange(S)[None, :] < lengths[:, None]      # [b, S]
    s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, vd)
    return out.reshape(b, nh, hd).astype(q.dtype)
