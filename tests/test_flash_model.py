"""Flash attention wired into the model: forward/grad parity with the naive
attention path."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST
import pytest


def test_model_flash_matches_naive():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    cfg_f = cfg.replace(use_flash_attention=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)
    a = llama.forward(params, cfg, ids)
    b = llama.forward(params, cfg_f, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_model_flash_grad_matches():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    cfg_f = cfg.replace(use_flash_attention=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 32), 0, cfg.vocab_size)

    g1 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg, ids) ** 2) * 1e-4)(params)
    g2 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg_f, ids) ** 2) * 1e-4)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        ),
        g1, g2,
    )


def test_model_flash_with_full_mask_matches_naive():
    """An all-ones attention_mask routes through the flash kernel (as
    lengths == s) and must match the naive einsum path exactly."""
    cfg = TINY_TEST.replace(use_flash_attention=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, cfg.vocab_size)
    mask = jnp.ones((1, 32))
    out = llama.forward(params, cfg, ids, attention_mask=mask)
    want = llama.forward(params, cfg.replace(use_flash_attention=False), ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_padded_batch_uses_flash_and_matches_einsum():
    """A right-padded attention_mask must route through the flash kernel
    (no silent O(s²) fallback) and match the einsum path at valid
    positions — forward and parameter gradients."""
    cfg_f = TINY_TEST.replace(use_flash_attention=True, w_bits=8, a_bits=8, kv_bits=8)
    cfg_e = cfg_f.replace(use_flash_attention=False)
    params = llama.init_params(cfg_f, jax.random.PRNGKey(0))
    b, s = 2, 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg_f.vocab_size)
    lengths = jnp.asarray([37, 64], jnp.int32)
    mask = (jnp.arange(s)[None, :] < lengths[:, None]).astype(jnp.int32)
    valid = mask[..., None].astype(jnp.float32)

    out_f = llama.forward(params, cfg_f, ids, attention_mask=mask)
    out_e = llama.forward(params, cfg_e, ids, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_f * valid), np.asarray(out_e * valid),
        rtol=2e-4, atol=2e-4,
    )

    labels = jnp.where(mask == 1, ids, -100)

    def loss(p, cfg):
        logits = llama.forward(p, cfg, ids, attention_mask=mask)
        return llama.causal_lm_loss(logits, labels)

    g_f = jax.grad(loss)(params, cfg_f)
    g_e = jax.grad(loss)(params, cfg_e)
    for a, b_ in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_e)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-3, atol=2e-4
        )


def test_non_prefix_mask_concrete_falls_back_to_einsum():
    """A concrete non-right-padded mask (left padding) must NOT take the
    flash-lengths path — it falls back to the exact einsum path (ADVICE
    round-2 medium: sum()-to-lengths is only valid for prefix masks)."""
    cfg_f = TINY_TEST.replace(use_flash_attention=True)
    cfg_e = cfg_f.replace(use_flash_attention=False)
    params = llama.init_params(cfg_f, jax.random.PRNGKey(0))
    b, s = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg_f.vocab_size)
    # left padding: zeros first — sum() would say length 20 but the valid
    # region is columns 12..32, so flash-with-lengths would be wrong
    mask = (jnp.arange(s)[None, :] >= jnp.asarray([[12], [0]])).astype(jnp.int32)
    out_f = llama.forward(params, cfg_f, ids, attention_mask=mask)
    out_e = llama.forward(params, cfg_e, ids, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), rtol=2e-4, atol=2e-4
    )


def test_non_prefix_mask_under_jit_poisons_with_nan():
    """Under jit the mask is a tracer and cannot branch in Python: a
    non-prefix (left-padded) mask must poison the logits with NaN — the
    sentinel that makes silent wrong attention impossible. (A host
    jax.debug.callback used to also raise a readable error, but host
    callbacks are UNIMPLEMENTED on the axon TPU runtime — round 5.)"""
    cfg_f = TINY_TEST.replace(use_flash_attention=True)
    params = llama.init_params(cfg_f, jax.random.PRNGKey(0))
    b, s = 1, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg_f.vocab_size)
    fwd = jax.jit(lambda m: llama.forward(params, cfg_f, ids, attention_mask=m))
    bad = (jnp.arange(s)[None, :] >= 12).astype(jnp.int32)   # left-padded
    assert not bool(jnp.isfinite(fwd(bad)).all())
    good = (jnp.arange(s)[None, :] < 20).astype(jnp.int32)   # right-padded
    assert bool(jnp.isfinite(fwd(good)).all())


@pytest.mark.slow
def test_flash_long_context_4096_interpret():
    """s=4096 through the flash kernel fwd+bwd (interpret mode): the
    long-context claim's CPU-runnable gate (the real-chip artifact is
    benchmarks/bench_flash_long.py)."""
    from llm_qat_tpu.ops.pallas.flash_attention import flash_attention_gqa

    B, G, S, D = 1, 2, 4096, 16
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (B, G, S, D), jnp.float32) * 0.3
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, D), jnp.float32) * 0.3
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, D), jnp.float32)
    lengths = jnp.full((B,), S, jnp.int32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention_gqa(q, k, v, lengths) ** 2) * 1e-4

    def f_naive(q, k, v):
        scale = 1.0 / (D ** 0.5)
        s_ = jnp.einsum("bgqd,bkd->bgqk", q, k) * scale
        mask = jnp.tril(jnp.ones((S, S), bool))
        s_ = jnp.where(mask[None, None], s_, -1e30)
        p = jax.nn.softmax(s_, axis=-1)
        return jnp.sum(jnp.einsum("bgqk,bkd->bgqd", p, v) ** 2) * 1e-4

    # spot-check a coarse slice of the forward + the full grads
    got = float(f_flash(q, k, v))
    want = float(f_naive(q, k, v))
    assert got == pytest.approx(want, rel=2e-4)
    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )
