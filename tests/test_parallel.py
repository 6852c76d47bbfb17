"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4
"Distributed without a cluster"): FSDP/TP-sharded forward and grads must
equal the single-device numerics, and shardings must actually partition the
params.

Note on precision: fake-quant contains `round()`, so reduction-order
differences between sharded and unsharded matmul partial sums can flip a
quantization level in f32 and produce O(quant-step) output diffs. That is
expected behavior of the *math*, not a sharding bug. To test the sharding
logic strictly we run these tests in float64, where 1e-16 reduction
differences cannot reach a rounding boundary.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.models import llama
from llm_qat_tpu.parallel import mesh as pmesh


CFG = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)


@pytest.fixture(autouse=True)
def x64():
    with jax.enable_x64(True):
        yield


def _data():
    params = llama.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float64)
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, CFG.vocab_size)
    return params, ids


def test_mesh_shapes():
    m = pmesh.make_mesh(data=1, fsdp=4, tp=2)
    assert m.shape == {"data": 1, "fsdp": 4, "tp": 2}
    m2 = pmesh.make_mesh()  # fsdp absorbs everything
    assert m2.shape["fsdp"] == len(jax.devices())
    with pytest.raises(ValueError):
        pmesh.make_mesh(data=3, fsdp=3, tp=1)


@pytest.mark.slow
def test_fsdp_sharded_forward_matches_single_device():
    params, ids = _data()
    want = np.asarray(jax.jit(lambda p, i: llama.forward(p, CFG, i))(params, ids))

    mesh = pmesh.make_mesh(data=1, fsdp=8, tp=1)
    sp = pmesh.shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, pmesh.batch_spec()))
    fwd = jax.jit(
        lambda p, i: llama.forward(p, CFG, i),
        out_shardings=NamedSharding(mesh, P(("data", "fsdp"), None, None)),
    )
    got = np.asarray(fwd(sp, ids_s))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tp_sharded_forward_matches_single_device():
    params, ids = _data()
    want = np.asarray(jax.jit(lambda p, i: llama.forward(p, CFG, i))(params, ids))
    mesh = pmesh.make_mesh(data=2, fsdp=2, tp=2)
    sp = pmesh.shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, pmesh.batch_spec()))
    got = np.asarray(jax.jit(lambda p, i: llama.forward(p, CFG, i))(sp, ids_s))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_params_actually_sharded():
    params, _ = _data()
    mesh = pmesh.make_mesh(data=1, fsdp=8, tp=1)
    sp = pmesh.shard_params(params, mesh)
    q = sp["layers"]["q"]
    # [L, in, out] with in sharded over fsdp=8
    shard_shape = q.sharding.shard_shape(q.shape)
    assert shard_shape[1] == q.shape[1] // 8


@pytest.mark.slow
def test_grad_under_fsdp_tp_matches():
    params, ids = _data()

    def loss(p, i):
        return jnp.sum(llama.forward(p, CFG, i) ** 2) * 1e-6

    want = jax.jit(jax.grad(loss))(params, ids)
    mesh = pmesh.make_mesh(data=2, fsdp=2, tp=2)
    sp = pmesh.shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, pmesh.batch_spec()))
    got = jax.jit(jax.grad(loss))(sp, ids_s)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        got,
        want,
    )
