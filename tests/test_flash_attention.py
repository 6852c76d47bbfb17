"""Flash attention kernel vs the model's reference attention path."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import flash_attention as FA
from llm_qat_tpu.models.llama import _attend, causal_mask


def _ref_attend(q, k, v):
    b, s = q.shape[0], q.shape[1]
    mask = causal_mask(b, s, None)
    return _attend(q, k, v, mask)


def test_flash_matches_naive_mha():
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 4, 32
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    got = FA.flash_attention(q, k, v, bq=32, bk=32)
    want = _ref_attend(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_matches_naive_gqa():
    rng = np.random.default_rng(1)
    b, s, h, kvh, d = 1, 32, 8, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, kvh, d)).astype(np.float32))
    got = FA.flash_attention(q, k, v, bq=16, bk=16)
    want = _ref_attend(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(FA.flash_attention(q, k, v, bq=16, bk=16) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attend(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_flash_causality():
    """Changing future keys/values must not affect earlier outputs."""
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    out1 = FA.flash_attention(q, k, v, bq=16, bk=16)
    k2 = k.at[:, 20:].set(99.0)
    v2 = v.at[:, 20:].set(-99.0)
    out2 = FA.flash_attention(q, k2, v2, bq=16, bk=16)
    np.testing.assert_allclose(
        np.asarray(out1[:, :20]), np.asarray(out2[:, :20]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(out1[:, 20:]), np.asarray(out2[:, 20:]))


def test_flash_lengths_match_padded_mask():
    """Right-padded batch through the lengths operand == einsum path with
    the equivalent additive padding mask, at valid positions (fwd + grads)."""
    rng = np.random.default_rng(4)
    b, s, h, kvh, d = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, kvh, d)).astype(np.float32))
    lengths = jnp.asarray([37, 64], jnp.int32)
    attn_mask = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.int32)
    # valid-position selector [b, s, 1]
    valid = attn_mask[..., None].astype(jnp.float32)

    def loss_flash(q, k, v):
        out = FA.flash_attention(q, k, v, lengths=lengths, bq=32, bk=32)
        return jnp.sum((out * valid) ** 2)

    def loss_ref(q, k, v):
        mask = causal_mask(b, s, attn_mask)
        return jnp.sum((_attend(q, k, v, mask) * valid) ** 2)

    got = FA.flash_attention(q, k, v, lengths=lengths, bq=32, bk=32)
    want = _attend(q, k, v, causal_mask(b, s, attn_mask))
    np.testing.assert_allclose(
        np.asarray(got * valid), np.asarray(want * valid), rtol=2e-5, atol=2e-5
    )
    assert np.isfinite(np.asarray(got)).all()  # padded rows finite garbage

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5)


def test_flash_length_zero_row_is_finite():
    """A fully-padded sequence (length 0, e.g. an unused eval-bucket row)
    must not NaN the kernel output."""
    rng = np.random.default_rng(5)
    b, s, h, d = 2, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    out = FA.flash_attention(q, k, v, lengths=jnp.asarray([0, 32]), bq=16, bk=16)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_softmax_bf16_close_to_fp32():
    """Flag-gated bf16-softmax variant (config.flash_softmax_bf16): the
    forward probabilities round at bf16 (<=2^-8 rel); outputs must stay
    close to the fp32-softmax kernel."""
    import numpy as np
    from llm_qat_tpu.ops.pallas.flash_attention import flash_attention

    B, S, NH, D = 2, 256, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, NH, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, 2, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, 2, D), jnp.float32)
    a = np.asarray(flash_attention(q, k, v))
    b = np.asarray(flash_attention(q, k, v, softmax_bf16=True))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)
    assert not np.array_equal(a, b)  # the flag actually changes the path
