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


def test_model_flash_with_padding_mask_falls_back():
    """attention_mask present -> naive path (flash is causal-only)."""
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
    b, s = 2, 128
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, cfg_f.vocab_size)
    lengths = jnp.asarray([77, 128], jnp.int32)
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
