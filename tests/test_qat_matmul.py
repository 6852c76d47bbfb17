"""Fused int8-MXU QAT matmul: forward/grad parity with quant_dense."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.linear import quant_dense
from llm_qat_tpu.ops.pallas.qat_matmul import fused_quant_matmul, supported
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST
import pytest


def test_supported_gate():
    assert supported(4, 8) and supported(8, 8) and supported(3, 4)
    assert not supported(2, 8) and not supported(4, 32) and not supported(16, 8)


def test_forward_matches_quant_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    for wb, ab in [(4, 8), (8, 8), (3, 4)]:
        got = np.asarray(fused_quant_matmul(x, w, wb, ab))
        want = np.asarray(quant_dense(x, w, w_bits=wb, a_bits=ab))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grads_match_quant_dense():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-3, 3, (8, 64)).astype(np.float32))
    w = jnp.asarray(rng.uniform(-3, 3, (64, 32)).astype(np.float32) * 0.8)

    def loss_fused(x, w):
        return jnp.sum(fused_quant_matmul(x, w, 4, 8) ** 2) * 1e-3

    def loss_ref(x, w):
        return jnp.sum(quant_dense(x, w, w_bits=4, a_bits=8) ** 2) * 1e-3

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-3, atol=1e-3)
    # STE masks: elements outside +-2 must have exactly zero grad
    assert (np.asarray(gx1)[np.abs(np.asarray(x)) >= 2] == 0).all()
    assert (np.asarray(gw1)[np.abs(np.asarray(w)) >= 2] == 0).all()


@pytest.mark.slow
def test_model_with_fused_matmul_matches():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    cfg_f = cfg.replace(fused_qat_matmul=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    a = np.asarray(llama.forward(params, cfg, ids))
    b = np.asarray(llama.forward(params, cfg_f, ids))
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-3)

    g1 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg, ids) ** 2) * 1e-6)(params)
    g2 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg_f, ids) ** 2) * 1e-6)(params)
    jax.tree.map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=5e-2, atol=1e-4
        ),
        g1, g2,
    )
