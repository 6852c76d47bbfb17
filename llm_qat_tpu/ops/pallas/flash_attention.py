"""Blockwise (flash) causal attention — Pallas TPU kernel.

The reference materializes the full ``[b, h, q, kv]`` score matrix with an
fp32 softmax (modeling_llama_quant.py:352-377) — O(s²) HBM traffic and
memory, flagged in SURVEY.md §5 as the long-context blocker. This kernel
computes attention blockwise with an online softmax: scores never leave
VMEM, HBM traffic is O(s·d), and causal blocks beyond the query block are
skipped entirely (the dynamic inner-loop bound cuts ~2x work).

Forward-only kernel + ``jax.custom_vjp``: the backward recomputes blocks via
the naive einsum path (same transient memory as the reference's backward;
a dedicated backward kernel is a later optimization).

Layout: heads are folded into the leading dim — ``[BH, S, D]`` — so the
kernel grid is (BH, S/bq) and each program streams K/V for one head.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, bq: int, bk: int, scale: float):
    iq = pl.program_id(1)
    start_q = iq * bq
    d = q_ref.shape[-1]
    s_kv = k_ref.shape[1]

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


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def _flash_fwd(q, k, v, bq: int, bk: int):
    """q/k/v: [BH, S, D] (same S; causal). Returns [BH, S, D]."""
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
        out_specs=pl.BlockSpec(
            (1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, S, D), q.dtype),
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
    """Causal flash attention on ``[BH, S, D]`` operands."""
    return _flash_fwd(q, k, v, bq, bk)


def _fa_fwd(q, k, v, bq, bk):
    return _flash_fwd(q, k, v, bq, bk), (q, k, v)


def _fa_bwd(bq, bk, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_naive_attention, q, k, v)
    return vjp(g)


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
