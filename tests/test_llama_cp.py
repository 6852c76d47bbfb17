"""Context-parallel training forward vs the single-logical-device model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from llm_qat_tpu.models import llama, llama_cp
from llm_qat_tpu.models.config import TINY_TEST


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("cp",))


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


@pytest.mark.slow
def test_cp_forward_matches_standard():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float64)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size)
    want = np.asarray(jax.jit(lambda p, i: llama.forward(p, cfg, i))(params, ids))
    got = np.asarray(llama_cp.cp_forward(params, cfg, ids, _mesh()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cp_forward_gqa_and_remat():
    cfg = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
    assert cfg.kv_heads < cfg.num_attention_heads  # actually GQA
    params = llama.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float64)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 32), 0, cfg.vocab_size)
    want = np.asarray(llama.forward(params, cfg, ids))
    got = np.asarray(
        llama_cp.cp_forward(params, cfg, ids, _mesh(4), remat=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cp_grads_match():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float64)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 32), 0, cfg.vocab_size)
    mesh = _mesh(4)

    g1 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg, ids) ** 2) * 1e-6)(params)
    g2 = jax.grad(
        lambda p: jnp.sum(llama_cp.cp_forward(p, cfg, ids, mesh) ** 2) * 1e-6
    )(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8
        ),
        g1, g2,
    )


@pytest.mark.slow
def test_cp_transport_quantization_close():
    """int8 ring transport adds only small error on top of the model's own
    KV quant."""
    cfg = TINY_TEST.replace(w_bits=32, a_bits=32, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float64)
    ids = jax.random.randint(jax.random.PRNGKey(6), (1, 32), 0, cfg.vocab_size)
    exact = np.asarray(llama_cp.cp_forward(params, cfg, ids, _mesh(4)))
    compressed = np.asarray(
        llama_cp.cp_forward(
            params, cfg, ids, _mesh(4), ring_transport_bits=8
        )
    )
    # not identical, but close
    assert not np.array_equal(exact, compressed)
    np.testing.assert_allclose(compressed, exact, rtol=0.1, atol=0.05)
