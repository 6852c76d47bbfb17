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

Layout: heads are folded into the leading dim — ``[BH, S, D]`` — so the
kernel grid is (BH, S/bq) and each program streams K/V for one head.
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


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, bq: int, bk: int, scale: float
):
    iq = pl.program_id(1)
    start_q = iq * bq
    d = q_ref.shape[-1]

    q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]

    # causal: only kv blocks with start < start_q + bq contribute
    n_blocks = (start_q + bq + bk - 1) // bk

    row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(kb, carry):
        m, l, acc = carry
        start_k = kb * bk
        k = k_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)  # [bk, d]
        v = v_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(col_ids <= row_ids, s, _NEG_INF)

        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # log-sum-exp per row, saved for the backward kernels ([1, 1, bq] block)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def _flash_fwd(q, k, v, bq: int, bk: int):
    """q/k/v: [BH, S, D] (same S; causal). Returns ([BH, S, D], lse [BH, S])."""
    BH, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    grid = (BH, S // bq)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, bq=bq, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * S * S * D // 2,  # ~half the square is causal-live
            bytes_accessed=3 * BH * S * D * 2 + BH * S * D * 2,
            transcendentals=BH * S * S // 2,
        ),
        interpret=_interpret(),
    )(q, k, v)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, bq: int, bk: int, scale: float,
):
    """dQ_i = scale * sum_j (P_ij * (dO_i V_j^T - D_i)) K_j, blockwise."""
    iq = pl.program_id(1)
    start_q = iq * bq
    d = q_ref.shape[-1]

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]       # [bq, 1]
    delta = delta_ref[0, 0][:, None]   # [bq, 1]

    n_blocks = (start_q + bq + bk - 1) // bk
    row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)

    def body(kb, dq):
        start_k = kb * bk
        k = k_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = col_ids <= row_ids
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, n_blocks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = (scale * dq).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, bq: int, bk: int, scale: float, s_total: int,
):
    """dK_j / dV_j accumulated over query blocks i >= j."""
    jk = pl.program_id(1)
    start_k = jk * bk
    d = k_ref.shape[-1]

    k = k_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)
    v = v_ref[0, pl.ds(start_k, bk), :].astype(jnp.float32)

    first_q = (start_k // bq)
    n_q_blocks = s_total // bq
    col_ids = start_k + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)

    def body(iq, carry):
        dk, dv = carry
        start_q = iq * bq
        q = q_ref[0, pl.ds(start_q, bq), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(start_q, bq), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(start_q, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(start_q, bq)][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        row_ids = start_q + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        mask = col_ids <= row_ids
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dv_new = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_new = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(first_q, n_q_blocks, body, (dk0, dv0))
    dk_ref[0] = (scale * dk).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def _flash_bwd(q, k, v, o, lse, do, bq: int, bk: int):
    BH, S, D = q.shape
    scale = 1.0 / (D ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]  # [BH, 1, S]

    full = lambda b, i: (b, 0, 0)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, bq=bq, bk=bk, scale=scale),
        grid=(BH, S // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, bq=bq, bk=bk, scale=scale, s_total=S
        ),
        grid=(BH, S // bk),
        in_specs=[
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, D), k.dtype),
            jax.ShapeDtypeStruct((BH, S, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _naive_attention(q, k, v):
    """Reference-shaped attention for the backward recompute (fp32 softmax,
    causal) — numerically the modeling_llama_quant.py:352-377 path."""
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
def flash_attention_bhsd(q, k, v, bq: int = 128, bk: int = 128):
    """Causal flash attention on ``[BH, S, D]`` operands. Backward is the
    dedicated blockwise kernel pair (dq; dk/dv) driven by the saved
    log-sum-exp — no O(S²) tensor is ever materialized in HBM."""
    return _flash_fwd(q, k, v, bq, bk)[0]


def _fa_fwd(q, k, v, bq, bk):
    o, lse = _flash_fwd(q, k, v, bq, bk)
    return o, (q, k, v, o, lse)


def _fa_bwd(bq, bk, res, g):
    q, k, v, o, lse = res
    return _flash_bwd(q, k, v, o, lse, g, bq, bk)


flash_attention_bhsd.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(
    q: jax.Array,  # [b, s, nh, d]
    k: jax.Array,  # [b, s, kvh, d]
    v: jax.Array,  # [b, s, kvh, d]
    *,
    bq: int = 128,
    bk: int = 128,
) -> jax.Array:
    """Model-layout wrapper: GQA by repeating KV heads into the folded
    batch-head dim; returns ``[b, s, nh*d]`` like `models.llama._attend`."""
    b, s, nh, d = q.shape
    kvh = k.shape[2]
    groups = nh // kvh
    if groups > 1:
        k = jnp.repeat(k, groups, axis=2)
        v = jnp.repeat(v, groups, axis=2)
    # [b, s, nh, d] -> [b*nh, s, d]
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * nh, s, d)
    bq_eff = min(bq, s)
    bk_eff = min(bk, s)
    if s % bq_eff or s % bk_eff:
        raise ValueError(f"seq len {s} not divisible by block ({bq_eff},{bk_eff})")
    out = flash_attention_bhsd(fold(q), fold(k), fold(v), bq_eff, bk_eff)
    return out.reshape(b, nh, s, d).transpose(0, 2, 1, 3).reshape(b, s, nh * d)
