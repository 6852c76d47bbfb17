"""Ring context-parallel attention vs single-device causal attention on the
8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models.llama import _attend, causal_mask
from llm_qat_tpu.parallel import mesh as pmesh
from llm_qat_tpu.parallel.ring_attention import ring_attention
from jax.sharding import Mesh
import pytest


def _cp_mesh(n=8):
    devs = np.asarray(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("cp",))


def _naive(q, k, v):
    b, s = q.shape[0], q.shape[1]
    out = _attend(q, k, v, causal_mask(b, s, None))  # [b, s, h*d]
    return out.reshape(q.shape)


@pytest.mark.slow
def test_ring_matches_naive_unquantized():
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    got = ring_attention(q, k, v, _cp_mesh(), kv_bits=None)
    want = _naive(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_ring_quantized_matches_fake_quant_kv():
    """int8 ring exchange == attention over per-token fake-quantized K/V."""
    from llm_qat_tpu.ops.quantize import kv_fake_quant

    rng = np.random.default_rng(1)
    b, s, h, d = 1, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    got = ring_attention(q, k, v, _cp_mesh(), kv_bits=8)
    kq = kv_fake_quant(k.reshape(b, s, h * d), 8).reshape(b, s, h, d)
    vq = kv_fake_quant(v.reshape(b, s, h * d), 8).reshape(b, s, h, d)
    want = _naive(q, kq, vq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_ring_causality():
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 32, 2, 8
    mesh = _cp_mesh(4)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    out1 = ring_attention(q, k, v, mesh, kv_bits=None)
    # poison the last chunk; earlier outputs must be untouched
    k2 = k.at[:, 24:].set(50.0)
    v2 = v.at[:, 24:].set(-50.0)
    out2 = ring_attention(q, k2, v2, mesh, kv_bits=None)
    np.testing.assert_allclose(
        np.asarray(out1[:, :24]), np.asarray(out2[:, :24]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_ring_grad_flows():
    rng = np.random.default_rng(3)
    b, s, h, d = 1, 32, 2, 8
    mesh = _cp_mesh(4)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, kv_bits=None) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(_naive(q, k, v) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
