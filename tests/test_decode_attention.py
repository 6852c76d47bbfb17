"""Fused quantized-KV decode attention kernel vs the XLA oracle.

The kernel takes K AND V TRANSPOSED — ``[b, kvh, hd, S]`` (canonical MXU score
contraction; see the module docstring) — while the oracle keeps the natural
``[b, kvh, S, hd]``; ``_t`` converts between them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_qat_tpu.ops.pallas import decode_attention as DA


def _t(k_q):
    return jnp.swapaxes(k_q, 2, 3)


def _make(b, kvh, groups, S, hd, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, kvh * groups, hd)), jnp.float32)
    k_q = jnp.asarray(rng.integers(-127, 128, size=(b, kvh, S, hd)), jnp.int8)
    v_q = jnp.asarray(rng.integers(-127, 128, size=(b, kvh, S, hd)), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.005, 0.02, size=(b, S)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.005, 0.02, size=(b, S)), jnp.float32)
    return q, k_q, k_s, v_q, v_s


def _tables(S, hd, theta=10000.0):
    """Hoisted RoPE tables in the kernel's transposed [hd/2, S] layout."""
    pos = jnp.arange(S, dtype=jnp.float32)
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    fr = inv_freq[:, None] * pos[None, :]
    return jnp.cos(fr), jnp.sin(fr)


@pytest.mark.parametrize(
    "b,kvh,groups,S,hd,bk",
    [
        (2, 2, 4, 128, 64, 64),   # GQA, multiple blocks
        (2, 4, 1, 64, 64, 64),    # MHA (groups=1), single block
        (1, 2, 2, 256, 128, 64),  # hd=128, ragged lengths below
    ],
)
def test_kernel_matches_oracle(b, kvh, groups, S, hd, bk):
    q, k_q, k_s, v_q, v_s = _make(b, kvh, groups, S, hd)
    lengths = jnp.asarray(
        [S // 2 + 1] + [S] * (b - 1), jnp.int32
    )  # ragged: first slot partial
    out = DA.quantized_decode_attention(
        q, _t(k_q), k_s, _t(v_q), v_s, lengths, theta=10000.0, bk=bk
    )
    ref = DA.decode_attention_reference(
        q, k_q, k_s, v_q, v_s, lengths, theta=10000.0
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_hoisted_tables_match_oracle():
    """rope via precomputed cos/sin operands == the oracle's table math."""
    b, kvh, groups, S, hd = 2, 2, 4, 128, 64
    q, k_q, k_s, v_q, v_s = _make(b, kvh, groups, S, hd, seed=5)
    lengths = jnp.asarray([100, 128], jnp.int32)
    kc, ksn = _tables(S, hd)
    out = DA.quantized_decode_attention(
        q, _t(k_q), k_s, _t(v_q), v_s, lengths, kc, ksn, bk=64
    )
    ref = DA.decode_attention_reference(q, k_q, k_s, v_q, v_s, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_length_one_and_full():
    b, kvh, groups, S, hd = 3, 2, 2, 128, 64
    q, k_q, k_s, v_q, v_s = _make(b, kvh, groups, S, hd, seed=1)
    lengths = jnp.asarray([1, 127, 128], jnp.int32)
    out = DA.quantized_decode_attention(q, _t(k_q), k_s, _t(v_q), v_s, lengths, bk=64)
    ref = DA.decode_attention_reference(q, k_q, k_s, v_q, v_s, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_stale_rows_ignored():
    """Rows at positions >= length must not influence the result."""
    b, kvh, groups, S, hd = 1, 2, 2, 128, 64
    q, k_q, k_s, v_q, v_s = _make(b, kvh, groups, S, hd, seed=2)
    lengths = jnp.asarray([70], jnp.int32)
    out1 = DA.quantized_decode_attention(q, _t(k_q), k_s, _t(v_q), v_s, lengths, bk=64)
    # poison everything past length
    k_q2 = k_q.at[:, :, 70:].set(127)
    v_q2 = v_q.at[:, :, 70:].set(-127)
    out2 = DA.quantized_decode_attention(
        q, _t(k_q2), k_s, _t(v_q2), v_s, lengths, bk=64
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


@pytest.mark.parametrize("groups", [1, 4])
def test_paged_matches_contiguous(groups):
    """Paged kernel over a shuffled pool == contiguous kernel on the
    gathered cache."""
    b, kvh, hd, P, mp = 2, 2, 64, 64, 4
    S = P * mp
    n_pages = 16
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, kvh * groups, hd)), jnp.float32)
    pool_kq = jnp.asarray(
        rng.integers(-127, 128, size=(n_pages, kvh, P, hd)), jnp.int8
    )
    pool_vq = jnp.asarray(
        rng.integers(-127, 128, size=(n_pages, kvh, P, hd)), jnp.int8
    )
    pool_ks = jnp.asarray(rng.uniform(0.005, 0.02, (n_pages, P)), jnp.float32)
    pool_vs = jnp.asarray(rng.uniform(0.005, 0.02, (n_pages, P)), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(n_pages)[: b * mp].reshape(b, mp), jnp.int32
    )
    lengths = jnp.asarray([P * 2 + 7, S], jnp.int32)

    out = DA.quantized_paged_attention(
        q, _t(pool_kq), pool_ks, _t(pool_vq), pool_vs, lengths, bt
    )

    # gather the pages into a contiguous per-slot cache
    def gather(pool):  # -> [b, kvh, S, hd]
        g = jnp.take(pool, bt, axis=0)       # [b, mp, kvh, P, hd]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, kvh, S, hd)

    def gather_s(pool_s):                    # -> [b, S]
        return jnp.take(pool_s, bt, axis=0).reshape(b, S)

    ref = DA.quantized_decode_attention(
        q, _t(gather(pool_kq)), gather_s(pool_ks),
        _t(gather(pool_vq)), gather_s(pool_vs), lengths, bk=P,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )

    # and with hoisted tables on both
    kc, ksn = _tables(S, hd)
    out_t = DA.quantized_paged_attention(
        q, _t(pool_kq), pool_ks, _t(pool_vq), pool_vs, lengths, bt, kc, ksn
    )
    ref_t = DA.quantized_decode_attention(
        q, _t(gather(pool_kq)), gather_s(pool_ks),
        _t(gather(pool_vq)), gather_s(pool_vs), lengths, kc, ksn, bk=P,
    )
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(ref_t), atol=2e-5, rtol=2e-5
    )


def test_bf16_query():
    b, kvh, groups, S, hd = 2, 2, 4, 128, 64
    q, k_q, k_s, v_q, v_s = _make(b, kvh, groups, S, hd, seed=3)
    qb = q.astype(jnp.bfloat16)
    lengths = jnp.asarray([128, 90], jnp.int32)
    out = DA.quantized_decode_attention(qb, _t(k_q), k_s, _t(v_q), v_s, lengths, bk=64)
    assert out.dtype == jnp.bfloat16
    ref = DA.decode_attention_reference(
        q.astype(jnp.bfloat16).astype(jnp.float32), k_q, k_s, v_q, v_s, lengths
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.02, rtol=0.02
    )
