"""Blockwise (flash) causal attention — Pallas TPU kernel.

The reference materializes the full ``[b, h, q, kv]`` score matrix with an
fp32 softmax (modeling_llama_quant.py:352-377) — O(s²) HBM traffic and
memory, flagged in SURVEY.md §5 as the long-context blocker. This kernel
computes attention blockwise with an online softmax: scores never leave
VMEM, HBM traffic is O(s·d), and causally-dead KV blocks are skipped.

Forward and backward are both Pallas kernels under ``jax.custom_vjp``: the
forward saves per-row log-sum-exp, and the backward runs the standard
flash pair — a dQ kernel sweeping causal KV blocks and a dK/dV kernel
sweeping query blocks — so no O(s²) tensor is materialized in either pass.
The naive einsum path is kept for numerics gating in tests.

Streaming (round-2 rework of the round-1 full-S VMEM residency): every
operand is blocked through the grid — K/V blocks on a ``kb`` grid dim in
forward/dQ, Q/dO/LSE blocks on an ``iq`` grid dim in dK/dV — so per-program
VMEM is O(block²), independent of S; s=16k forward+backward fits one chip.
Causally-dead grid steps clamp their index map to the last live block
(same block index ⇒ the pipeline skips the re-fetch) and skip compute with
``pl.when``.

Variable length (right-padded batches): an optional per-sequence
``lengths`` operand rides scalar prefetch; columns ``>= length`` are masked
in all three kernels and the K/V index maps additionally clamp to the last
in-length block. Rows ``>= length`` produce finite garbage (they attend
cols ``< max(length, 1)``) and carry exact-zero cotangents in training —
identical in effect to the einsum path's fully-masked rows. This is what
lets padded-batch QAT run through flash instead of falling back to the
O(s²) path (VERDICT round-1 item 5).

Layout: operands carry an explicit GQA group dim — q ``[B, G, S, D]`` with
``B = batch*kv_heads`` and k/v ``[B, S, D]`` — so each program streams the
*un-repeated* K/V of one kv head (a materialized ``repeat_kv`` would
multiply K/V HBM traffic by G; the model's ``_attend`` avoids it the same
way). Dots take bf16 operands with fp32 accumulation — the reference's
bf16-autocast matmul + fp32 softmax semantics; the softmax/statistics stay
fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # log2(e)
_LN2 = 0.6931471805599453    # ln(2)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fit_block(target: int, s: int) -> int:
    """Largest block <= target that divides ``s`` (lane-aligned when s is).

    Applied inside ``_flash_fwd``/``_flash_bwd`` so every public entry
    (``flash_attention``, ``flash_attention_gqa``, ``flash_attention_bhsd``)
    gets a valid grid: a direct caller with S=512 at the bk=1024 default
    previously got nk=0 (kernel never ran, output unwritten) and S=1536
    silently attended only the first 1024 keys (ADVICE round 4)."""
    t = min(target, s)
    while s % t:
        t = t - t % 128 - 128 if t > 128 else t - 1
    if t < 1:
        raise ValueError(f"cannot block seq len {s}")
    return t


def _last_live_kv(iq: jax.Array, length: jax.Array, bq: int, bk: int,
                  causal: bool = True):
    """Last KV block index that is causally live for query block ``iq`` and
    within ``length`` (clamped to >=1 so empty rows still read block 0).
    With ``causal=False`` (ring-attention full-visibility steps) only the
    length bound applies."""
    len_last = (jnp.maximum(length, 1) - 1) // bk
    if not causal:
        return len_last
    causal_last = ((iq + 1) * bq - 1) // bk
    return jnp.minimum(causal_last, len_last)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    lens_ref, q_ref, kt_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, bq: int, bk: int, scale: float, nk: int, causal: bool = True,
    soft_bf16: bool = False,
):
    ib, iq, kb = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    length = lens_ref[ib]
    live_last = _last_live_kv(iq, length, bq, bk, causal)
    start_q = iq * bq

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(kb <= live_last)
    def _():
        q = q_ref[0, 0]          # [bq, d]
        k = kt_ref[0]            # [d, bk] — K transposed (round 4): the
        # score dot contracts (1, 0), the canonical MXU layout; the
        # previous [bk, d] block contracted (1, 1), which Mosaic serviced
        # with an in-VMEM transpose per block (~12% of kernel time at the
        # b=4 s=2048 prefill shape, measured)
        v = v_ref[0]
        start_k = kb * bk
        # base-2 softmax: the kernel is transcendental-bound at prefill
        # shapes (B*G*S^2/2 = 268M exps/layer-sweep, traced at ~45% of
        # kernel time), and TPU's native transcendental is exp2 — exp(x)
        # lowers to exp2(x*log2e) plus a [bq, bk] multiply. Folding log2e
        # into the score scale deletes that multiply; m/l stay in the
        # base-2 domain and only the final lse converts back with ln2.
        s = (scale * _LOG2E) * jax.lax.dot_general(
            q, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk] fp32, base-2 logits
        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        ok = col_ids < jnp.maximum(length, 1)
        if causal:
            row_ids = start_q + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0
            )
            ok = ok & (col_ids <= row_ids)
        s = jnp.where(ok, s, _NEG_INF)

        m = m_scr[:]
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp2(m - m_new)
        if soft_bf16:
            # flag-gated deviation from the reference's fp32 softmax
            # (config.flash_softmax_bf16): the kernel is transcendental-
            # bound and exp2 is evaluated on bf16 operands; max/l/acc
            # stay fp32, so only the probabilities round (<=2^-8 rel)
            p16 = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            p = p16.astype(jnp.float32)
            pv = p16.astype(v.dtype)
        else:
            p = jnp.exp2(s - m_new)
            pv = p.astype(v.dtype)
        m_scr[:] = m_new
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == nk - 1)
    def _():
        l = l_scr[:]
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # lse in nats (what the backward kernels consume): m is base-2
        lse_ref[0, 0, 0] = (m_scr[:] * _LN2 + jnp.log(l))[:, 0]


@functools.partial(
    jax.jit, static_argnames=("bq", "bk", "causal", "soft_bf16")
)
def _flash_fwd(q, k, v, lengths, bq: int, bk: int, causal: bool = True,
               soft_bf16: bool = False):
    """q: [B, G, S, D]; k/v: [B, S, D]; lengths [B] (causal within each S).
    Returns ([B, G, S, D], lse [B, G, 1, S])."""
    B, G, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    bq, bk = _fit_block(bq, S), _fit_block(bk, S)
    nq, nk = S // bq, S // bk
    grid = (B, G, nq, nk)
    # K streams transposed [B, D, S] so the in-kernel score dot is the
    # canonical (1, 0) contraction; the relayout copy here is O(B*S*D)
    # bf16 — ~0.01 ms/layer at the prefill shape, vs the ~12% per-block
    # in-VMEM transpose it replaces (round-4 flash retune, DESIGN.md)
    kt = jnp.swapaxes(k, 1, 2)

    def kt_idx(b, g, iq, kb, lens):
        return (b, 0, jnp.minimum(kb, _last_live_kv(iq, lens[b], bq, bk, causal)))

    def kv_idx(b, g, iq, kb, lens):
        return (b, jnp.minimum(kb, _last_live_kv(iq, lens[b], bq, bk, causal)), 0)

    return pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, bq=bq, bk=bk, scale=scale, nk=nk,
            causal=causal, soft_bf16=soft_bf16,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, g, iq, kb, lens: (b, g, iq, 0)),
                pl.BlockSpec((1, D, bk), kt_idx),
                pl.BlockSpec((1, bk, D), kv_idx),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, bq, D), lambda b, g, iq, kb, lens: (b, g, iq, 0)),
                pl.BlockSpec((1, 1, 1, bq), lambda b, g, iq, kb, lens: (b, g, 0, iq)),
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, G, 1, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * G * S * S * D // 2,  # ~half the square is causal-live
            bytes_accessed=2 * B * G * S * D * 2 + 2 * B * S * D * 2,
            transcendentals=B * G * S * S // 2,
        ),
        interpret=_interpret(),
    )(lengths, q, kt, v)


# ---------------------------------------------------------------------------
# backward: dQ
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    lens_ref, q_ref, kt_ref, k_ref, vt_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dq_scr,
    *, bq: int, bk: int, scale: float, nk: int, causal: bool = True,
):
    """dQ_i = scale * sum_j (P_ij * (dO_i V_j^T - D_i)) K_j, blockwise.

    K/V stream TRANSPOSED ([d, bk]) for the score and dP dots — canonical
    (1, 0) contractions (round-4 retune, same as the forward); K also
    streams untransposed for the dQ accumulation dot, which is already
    canonical in that layout. p is computed base-2 (exp2 with log2e
    folded into the operands — the VPU-native transcendental)."""
    ib, iq, kb = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    length = lens_ref[ib]
    live_last = _last_live_kv(iq, length, bq, bk, causal)
    start_q = iq * bq

    @pl.when(kb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(kb <= live_last)
    def _():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0, 0][:, None] * _LOG2E   # [bq, 1], base 2
        delta = delta_ref[0, 0, 0][:, None]         # [bq, 1]
        kt = kt_ref[0]                              # [d, bk]
        k = k_ref[0]                                # [bk, d]
        vt = vt_ref[0]                              # [d, bk]
        start_k = kb * bk
        s2 = (scale * _LOG2E) * jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        ok = col_ids < jnp.maximum(length, 1)
        if causal:
            row_ids = start_q + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0
            )
            ok = ok & (col_ids <= row_ids)
        s2 = jnp.where(ok, s2, _NEG_INF)
        p = jnp.exp2(s2 - lse2)
        dp = jax.lax.dot_general(
            do, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(kb == nk - 1)
    def _():
        dq_ref[0, 0] = (scale * dq_scr[:]).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward: dK/dV
# ---------------------------------------------------------------------------


def _flash_bwd_dkv_kernel(
    lens_ref, q_ref, kt_ref, vt_ref, do_ref, lse_ref, delta_ref, dk_ref,
    dv_ref, dk_scr, dv_scr,
    *, bq: int, bk: int, scale: float, nq: int, groups: int,
    causal: bool = True,
):
    """dK_j / dV_j accumulated over causally-live query blocks of every GQA
    group. Grid is (B, nk, G, nq) with iq innermost then g, so the fp32
    VMEM accumulators persist across all (g, iq) sharing a KV block; the
    write happens at the final (g, iq)."""
    ib, kb = pl.program_id(0), pl.program_id(1)
    grp, iq = pl.program_id(2), pl.program_id(3)
    length = lens_ref[ib]
    start_k = kb * bk
    # first query block with rows >= start_k (all blocks when non-causal)
    first_live = start_k // bq if causal else 0

    @pl.when((grp == 0) & (iq == 0))
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(iq >= first_live)
    def _():
        kt = kt_ref[0]                              # [d, bk]
        vt = vt_ref[0]                              # [d, bk]
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        lse2 = lse_ref[0, 0, 0][:, None] * _LOG2E
        delta = delta_ref[0, 0, 0][:, None]
        start_q = iq * bq
        s2 = (scale * _LOG2E) * jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        ok = col_ids < jnp.maximum(length, 1)
        if causal:
            row_ids = start_q + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0
            )
            ok = ok & (col_ids <= row_ids)
        s2 = jnp.where(ok, s2, _NEG_INF)
        p = jnp.exp2(s2 - lse2)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_scr[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when((grp == groups - 1) & (iq == nq - 1))
    def _():
        dk_ref[0] = (scale * dk_scr[:]).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "causal"))
def _flash_bwd(q, k, v, lengths, o, lse, do, bq: int, bk: int,
               causal: bool = True):
    B, G, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    bq, bk = _fit_block(bq, S), _fit_block(bk, S)
    nq, nk = S // bq, S // bk
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, G, 1, S]

    qblk = lambda b, g, iq, kb, lens: (b, g, iq, 0)
    lseblk = lambda b, g, iq, kb, lens: (b, g, 0, iq)
    # K/V transposed once ([B, D, S]) for the canonical score/dP dots in
    # both kernels (round-4 retune; the copies are ~0.01 ms at prefill
    # shapes). The dQ accumulation still wants [bk, D] K, so dq streams
    # K in both layouts — small blocks, and the score-dot transpose it
    # removes was per (iq, kb) program.
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    def kv_idx(b, g, iq, kb, lens):
        return (b, jnp.minimum(kb, _last_live_kv(iq, lens[b], bq, bk, causal)), 0)

    def kt_idx(b, g, iq, kb, lens):
        return (b, 0, jnp.minimum(kb, _last_live_kv(iq, lens[b], bq, bk, causal)))

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, bq=bq, bk=bk, scale=scale, nk=nk,
            causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G, nq, nk),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), qblk),
                pl.BlockSpec((1, D, bk), kt_idx),
                pl.BlockSpec((1, bk, D), kv_idx),
                pl.BlockSpec((1, D, bk), kt_idx),
                pl.BlockSpec((1, 1, bq, D), qblk),
                pl.BlockSpec((1, 1, 1, bq), lseblk),
                pl.BlockSpec((1, 1, 1, bq), lseblk),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), qblk),
            scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lengths, q, kt, k, vt, do, lse, delta)

    # dead iq blocks (entirely above the diagonal for this KV block) clamp
    # to the first live one: same index => the pipeline skips the re-fetch
    def q_idx(b, kb, g, iq, lens):
        if not causal:
            return (b, g, iq, 0)
        return (b, g, jnp.maximum(iq, (kb * bk) // bq), 0)

    def lse_idx(b, kb, g, iq, lens):
        if not causal:
            return (b, g, 0, iq)
        return (b, g, 0, jnp.maximum(iq, (kb * bk) // bq))

    kv_of_b = lambda b, kb, g, iq, lens: (b, kb, 0)
    kt_of_b = lambda b, kb, g, iq, lens: (b, 0, kb)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            bq=bq, bk=bk, scale=scale, nq=nq, groups=G, causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nk, G, nq),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), q_idx),
                pl.BlockSpec((1, D, bk), kt_of_b),
                pl.BlockSpec((1, D, bk), kt_of_b),
                pl.BlockSpec((1, 1, bq, D), q_idx),
                pl.BlockSpec((1, 1, 1, bq), lse_idx),
                pl.BlockSpec((1, 1, 1, bq), lse_idx),
            ],
            out_specs=(
                pl.BlockSpec((1, bk, D), kv_of_b),
                pl.BlockSpec((1, bk, D), kv_of_b),
            ),
            scratch_shapes=[
                pltpu.VMEM((bk, D), jnp.float32),
                pltpu.VMEM((bk, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lengths, q, kt, vt, do, lse, delta)
    return dq, dk, dv


def _naive_attention(q, k, v):
    """Reference-shaped attention for numerics gating (fp32 softmax, causal)
    — numerically the modeling_llama_quant.py:352-377 path. [BH, S, D]."""
    BH, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    s = jnp.where((jj <= ii)[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_gqa(q, k, v, lengths, bq: int = 512, bk: int = 1024,
                        soft_bf16: bool = False):
    """Causal flash attention: q ``[B, G, S, D]``, k/v ``[B, S, D]`` where
    ``B = batch*kv_heads`` and ``G`` is the GQA group size; ``lengths``
    ``[B]`` int32 masks columns ``>= length`` (pass ``S`` for no padding).
    Backward is the dedicated blockwise kernel pair (dq; dk/dv) driven by
    the saved log-sum-exp — no O(S²) tensor is ever materialized in HBM."""
    return _flash_fwd(q, k, v, lengths, bq, bk, soft_bf16=soft_bf16)[0]


def _fa_fwd(q, k, v, lengths, bq, bk, soft_bf16=False):
    o, lse = _flash_fwd(q, k, v, lengths, bq, bk, soft_bf16=soft_bf16)
    # named so a remat policy can save the kernel's residuals and skip the
    # flash forward recompute in the backward pass (models.llama.backbone's
    # remat_policy="save_attn")
    o = checkpoint_name(o, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return o, (q, k, v, lengths, o, lse)


def _fa_bwd(bq, bk, soft_bf16, res, g):
    # backward keeps the fp32 recompute regardless: the bf16-softmax flag
    # trades <=2^-8 relative p rounding in the FORWARD only
    q, k, v, lengths, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, lengths, o, lse, g, bq, bk)
    return dq, dk, dv, None


flash_attention_gqa.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_bhsd(q, k, v, bq: int = 512, bk: int = 1024):
    """MHA compatibility wrapper over ``[BH, S, D]`` operands (G=1)."""
    B, S, _ = q.shape
    lengths = jnp.full((B,), S, jnp.int32)
    return flash_attention_gqa(q[:, None], k, v, lengths, bq, bk)[:, 0]


def flash_attention(
    q: jax.Array,  # [b, s, nh, d]
    k: jax.Array,  # [b, s, kvh, d]
    v: jax.Array,  # [b, s, kvh, d]
    *,
    lengths: jax.Array = None,  # [b] int32 valid prefix per sequence
    bq: int = 512,
    bk: int = 1024,
    softmax_bf16: bool = False,  # flag-gated: bf16 exp2 operands
) -> jax.Array:
    """Model-layout wrapper: GQA via the kernel's group dim — K/V are
    never repeated (head h reads kv head ``h // groups``, matching
    `models.llama._attend`); returns ``[b, s, nh*d]``.

    ``lengths`` supports right-padded batches: keys/values at positions
    ``>= lengths[b]`` are masked for every query. Outputs at padded query
    rows are finite garbage (callers mask them downstream, as with the
    einsum path)."""
    b, s, nh, d = q.shape
    kvh = k.shape[2]
    groups = nh // kvh
    # [b, s, kvh, g, d] -> [b*kvh, g, s, d]
    q4 = (
        q.reshape(b, s, kvh, groups, d)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b * kvh, groups, s, d)
    )
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * kvh, s, d)

    bq_eff = _fit_block(bq, s)
    bk_eff = _fit_block(bk, s)
    if lengths is None:
        lens_B = jnp.full((b * kvh,), s, jnp.int32)
    else:
        lens_B = jnp.repeat(lengths.astype(jnp.int32), kvh)
    out = flash_attention_gqa(q4, fold(k), fold(v), lens_B, bq_eff,
                              bk_eff, softmax_bf16)
    # [b*kvh, g, s, d] -> [b, s, nh*d]
    return (
        out.reshape(b, kvh, groups, s, d)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, s, nh * d)
    )
