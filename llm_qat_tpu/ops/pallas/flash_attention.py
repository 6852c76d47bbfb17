"""Blockwise (flash) causal attention — Pallas TPU kernel.

The reference materializes the full ``[b, h, q, kv]`` score matrix with an
fp32 softmax (modeling_llama_quant.py:352-377) — O(s²) HBM traffic and
memory, flagged in SURVEY.md §5 as the long-context blocker. This kernel
computes attention blockwise with an online softmax: scores never leave
VMEM, HBM traffic is O(s·d), and causal blocks beyond the query block are
skipped entirely (the dynamic inner-loop bound cuts ~2x work).

Forward and backward are both Pallas kernels under ``jax.custom_vjp``: the
forward saves per-row log-sum-exp, and the backward runs the standard
flash pair — a dQ kernel looping causal KV blocks and a dK/dV kernel
looping query blocks — so no O(s²) tensor is materialized in either pass.
The naive einsum path is kept for numerics gating in tests.

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


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, bq: int, bk: int, scale: float
):
    iq = pl.program_id(2)
    start_q = iq * bq
    d = q_ref.shape[-1]

    q = q_ref[0, 0]  # [bq, d]

    # causal: only kv blocks with start < start_q + bq contribute
    n_blocks = (start_q + bq + bk - 1) // bk

    row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(kb, carry):
        m, l, acc = carry
        start_k = kb * bk
        k = k_ref[0, pl.ds(start_k, bk), :]  # [bk, d]
        v = v_ref[0, pl.ds(start_k, bk), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk] fp32

        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col_ids <= row_ids, s, _NEG_INF)

        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    # log-sum-exp per row, saved for the backward kernels ([1, 1, 1, bq] block)
    lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def _flash_fwd(q, k, v, bq: int, bk: int):
    """q: [B, G, S, D]; k/v: [B, S, D] (causal within each S).
    Returns ([B, G, S, D], lse [B, G, 1, S])."""
    B, G, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    grid = (B, G, S // bq)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, bq=bq, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, g, i: (b, g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, g, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, g, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), lambda b, g, i: (b, g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda b, g, i: (b, g, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, G, 1, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * G * S * S * D // 2,  # ~half the square is causal-live
            bytes_accessed=2 * B * G * S * D * 2 + 2 * B * S * D * 2,
            transcendentals=B * G * S * S // 2,
        ),
        interpret=_interpret(),
    )(q, k, v)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, bq: int, bk: int, scale: float,
):
    """dQ_i = scale * sum_j (P_ij * (dO_i V_j^T - D_i)) K_j, blockwise."""
    iq = pl.program_id(2)
    start_q = iq * bq
    d = q_ref.shape[-1]

    q = q_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, 0][:, None]       # [bq, 1]
    delta = delta_ref[0, 0, 0][:, None]   # [bq, 1]

    n_blocks = (start_q + bq + bk - 1) // bk
    row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(kb, dq):
        start_k = kb * bk
        k = k_ref[0, pl.ds(start_k, bk), :]
        v = v_ref[0, pl.ds(start_k, bk), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col_ids <= row_ids, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0, 0] = (scale * dq).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, bq: int, bk: int, scale: float, s_total: int, groups: int,
):
    """dK_j / dV_j accumulated over query blocks i >= j of every GQA group.

    Grid is (B, S/bk, G) with G innermost, so the fp32 VMEM accumulators
    persist across the G iterations that share an output block; the write
    happens on the final group."""
    jk = pl.program_id(1)
    grp = pl.program_id(2)
    start_k = jk * bk
    d = k_ref.shape[-1]

    @pl.when(grp == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0, pl.ds(start_k, bk), :]
    v = v_ref[0, pl.ds(start_k, bk), :]

    first_q = (start_k // bq)
    n_q_blocks = s_total // bq
    col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def body(iq, carry):
        dk, dv = carry
        start_q = iq * bq
        q = q_ref[0, 0, pl.ds(start_q, bq), :]
        do = do_ref[0, 0, pl.ds(start_q, bq), :]
        lse = lse_ref[0, 0, 0, pl.ds(start_q, bq)][:, None]
        delta = delta_ref[0, 0, 0, pl.ds(start_q, bq)][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

        row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        s = jnp.where(col_ids <= row_ids, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dv_new = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(first_q, n_q_blocks, body, (dk0, dv0))
    dk_acc[:] += scale * dk
    dv_acc[:] += dv

    @pl.when(grp == groups - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def _flash_bwd(q, k, v, o, lse, do, bq: int, bk: int):
    B, G, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, G, 1, S]

    qblk = lambda b, g, i: (b, g, i, 0)
    kvfull = lambda b, g, i: (b, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, bq=bq, bk=bk, scale=scale),
        grid=(B, G, S // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), kvfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), kvfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, D), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda b, g, i: (b, g, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bq), lambda b, g, i: (b, g, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D), qblk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    qfull = lambda b, j, g: (b, g, 0, 0)
    kv_of_b = lambda b, j, g: (b, 0, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            bq=bq, bk=bk, scale=scale, s_total=S, groups=G,
        ),
        grid=(B, S // bk, G),
        in_specs=[
            pl.BlockSpec((1, 1, S, D), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), kv_of_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), kv_of_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S), qfull, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S), qfull, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda b, j, g: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j, g: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_gqa(q, k, v, bq: int = 512, bk: int = 512):
    """Causal flash attention: q ``[B, G, S, D]``, k/v ``[B, S, D]`` where
    ``B = batch*kv_heads`` and ``G`` is the GQA group size. Backward is the
    dedicated blockwise kernel pair (dq; dk/dv) driven by the saved
    log-sum-exp — no O(S²) tensor is ever materialized in HBM."""
    return _flash_fwd(q, k, v, bq, bk)[0]


def _fa_fwd(q, k, v, bq, bk):
    o, lse = _flash_fwd(q, k, v, bq, bk)
    # named so a remat policy can save the kernel's residuals and skip the
    # flash forward recompute in the backward pass (models.llama.backbone's
    # remat_policy="save_attn")
    o = checkpoint_name(o, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return o, (q, k, v, o, lse)


def _fa_bwd(bq, bk, res, g):
    q, k, v, o, lse = res
    return _flash_bwd(q, k, v, o, lse, g, bq, bk)


flash_attention_gqa.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_bhsd(q, k, v, bq: int = 512, bk: int = 512):
    """MHA compatibility wrapper over ``[BH, S, D]`` operands (G=1)."""
    return flash_attention_gqa(q[:, None], k, v, bq, bk)[:, 0]


def flash_attention(
    q: jax.Array,  # [b, s, nh, d]
    k: jax.Array,  # [b, s, kvh, d]
    v: jax.Array,  # [b, s, kvh, d]
    *,
    bq: int = 512,
    bk: int = 512,
) -> jax.Array:
    """Model-layout wrapper: GQA via the kernel's group dim — K/V are
    never repeated (head h reads kv head ``h // groups``, matching
    `models.llama._attend`); returns ``[b, s, nh*d]``."""
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

    def fit(target: int) -> int:
        """Largest block <= target that divides s (lane-aligned when s is)."""
        t = min(target, s)
        while s % t:
            t = t - t % 128 - 128 if t > 128 else t - 1
        return t

    bq_eff = fit(bq)
    bk_eff = fit(bk)
    if bq_eff < 1:
        raise ValueError(f"cannot block seq len {s}")
    out = flash_attention_gqa(q4, fold(k), fold(v), bq_eff, bk_eff)
    # [b*kvh, g, s, d] -> [b, s, nh*d]
    return (
        out.reshape(b, kvh, groups, s, d)
        .transpose(0, 3, 1, 2, 4)
        .reshape(b, s, nh * d)
    )
