"""Ring context-parallel causal attention with quantized KV exchange.

The reference has no long-context path at all — attention materializes the
full score matrix and context is capped at 2048 (SURVEY.md §5
"Long-context"). This module supplies the TPU-native scaling path: the
sequence dim is sharded over a ``cp`` mesh axis; each device holds one
query/KV chunk and the KV chunks rotate around the ring
(``jax.lax.ppermute`` → ICI neighbor exchange on a TPU torus) while every
device accumulates blockwise online-softmax attention of its resident
queries. Peak memory is O(s/N · s/N) per device and the KV blocks travel
the ring as **int8 + per-token scales** (the paper's KV-cache quantization
doubling as ring-bandwidth compression — BASELINE.json "KV blocks travel in
int form + scales").

Numerics: with ``kv_bits=None`` the result equals single-device causal
attention exactly (up to fp reassociation). With ``kv_bits=8`` the result
equals attention over per-token fake-quantized K/V — the same math as
`ops.quantize.kv_fake_quant` with integer storage.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30
_EPS = 1e-6


def _quantize(x: jax.Array, bits: int):
    """[b, sl, h, d] -> int8 values + f32 scales per token over (h, d)
    (mirrors kv_fake_quant's flat-hidden per-token granularity)."""
    b, sl, h, d = x.shape
    flat = x.reshape(b, sl, h * d).astype(jnp.float32)
    qmax = float(2 ** (bits - 1) - 1)
    s = qmax / (jnp.max(jnp.abs(flat), axis=-1, keepdims=True) + _EPS)
    q = jnp.round(flat * s).astype(jnp.int8)
    return q, s


def _dequantize(q: jax.Array, s: jax.Array, shape, dtype):
    x = q.astype(jnp.float32) / (s + _EPS)
    return x.reshape(shape).astype(dtype)


def ring_attention_local(
    q: jax.Array,  # [b, sl, h, d] — this device's query chunk
    k: jax.Array,  # [b, sl, h, d]
    v: jax.Array,  # [b, sl, h, d]
    axis_name: str,
    n: int,
    kv_bits: Optional[int] = 8,
) -> jax.Array:
    """Body to run inside shard_map over the ``cp`` axis (``n`` = ring
    size, static). Heads must already match (repeat KV for GQA before
    sharding)."""
    b, sl, h, d = q.shape
    idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / (d ** 0.5)

    qf = q.astype(jnp.float32) * scale

    if kv_bits is not None:
        k_q, k_s = _quantize(k, kv_bits)
        v_q, v_s = _quantize(v, kv_bits)
    else:
        k_q, k_s = k, None
        v_q, v_s = v, None

    local_pos = jnp.arange(sl, dtype=jnp.int32)
    row = idx * sl + local_pos  # global positions of resident queries

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        m, l, acc, k_q, k_s, v_q, v_s = carry
        j = (idx - i) % n  # origin chunk index of the KV we currently hold
        if kv_bits is not None:
            k_ = _dequantize(k_q, k_s, (b, sl, h, d), jnp.float32)
            v_ = _dequantize(v_q, v_s, (b, sl, h, d), jnp.float32)
        else:
            k_, v_ = k_q.astype(jnp.float32), v_q.astype(jnp.float32)

        s = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_, preferred_element_type=jnp.float32
        )
        col = j * sl + local_pos
        mask = col[None, :] <= row[:, None]  # global causal
        s = jnp.where(mask[None, None], s, _NEG)

        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new) * mask[None, None]  # masked probs exactly 0
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_, preferred_element_type=jnp.float32
        )

        # rotate KV (int8 + scales when quantized -> half the ICI bytes)
        k_q2 = jax.lax.ppermute(k_q, axis_name, perm)
        v_q2 = jax.lax.ppermute(v_q, axis_name, perm)
        k_s2 = jax.lax.ppermute(k_s, axis_name, perm) if k_s is not None else None
        v_s2 = jax.lax.ppermute(v_s, axis_name, perm) if v_s is not None else None
        return m_new, l_new, acc_new, k_q2, k_s2, v_q2, v_s2

    m0 = jnp.full((b, h, sl, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((b, h, sl, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, sl, d), jnp.float32)
    state = (m0, l0, acc0, k_q, k_s, v_q, v_s)
    # unrolled: n is the static mesh axis size, so each step's ppermute can
    # overlap the next step's compute under XLA latency hiding
    for i in range(n):
        state = body(i, state)
    m, l, acc = state[0], state[1], state[2]
    out = (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)  # [b, h, sl, d]
    return out.transpose(0, 2, 1, 3)  # [b, sl, h, d]


def ring_attention(
    q: jax.Array,  # [b, s, h, d] global
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "cp",
    kv_bits: Optional[int] = 8,
) -> jax.Array:
    """shard_map wrapper: shard s over ``axis``, run the ring, return the
    full [b, s, h, d] output with the same sharding."""
    from jax import shard_map

    n = mesh.shape[axis]
    b, s, h, d = q.shape
    if s % n:
        raise ValueError(f"seq {s} not divisible by ring size {n}")
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(
            ring_attention_local, axis_name=axis, n=n, kv_bits=kv_bits
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
