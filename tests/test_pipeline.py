"""Pipeline parallelism: pipelined forward/backward == single-device."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.parallel import pipeline as PP
import pytest

CFG = LlamaConfig(
    vocab_size=97,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=32,
    w_bits=4,
    a_bits=8,
    kv_bits=4,
)


def _mesh(pp: int) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:pp]), ("pp",))


def _setup(key=0, b=4, s=16):
    params = llama.init_params(CFG, jax.random.PRNGKey(key))
    ids = jax.random.randint(
        jax.random.PRNGKey(key + 1), (b, s), 0, CFG.vocab_size
    )
    return params, ids


@pytest.mark.slow
def test_pipeline_forward_matches_single_device():
    params, ids = _setup()
    want = llama.forward(params, CFG, ids)
    for pp, M in ((2, 2), (4, 4), (4, 2)):
        mesh = _mesh(pp)
        sharded = PP.shard_params_pp(params, mesh)
        got = jax.jit(
            lambda p, i: PP.pipeline_forward(
                p, CFG, i, mesh, num_microbatches=M
            )
        )(sharded, ids)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


@pytest.mark.slow
def test_pipeline_grads_match_single_device():
    params, ids = _setup(key=7)
    batch = {"input_ids": ids, "labels": ids}
    mesh = _mesh(4)
    sharded = PP.shard_params_pp(params, mesh)

    def ref_loss(p):
        return llama.causal_lm_loss(llama.forward(p, CFG, ids), ids)

    g_ref = jax.grad(ref_loss)(params)
    g_pp = jax.jit(
        jax.grad(
            lambda p: PP.pipeline_lm_loss(
                p, CFG, batch, mesh, num_microbatches=4
            )
        )
    )(sharded)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_pipeline_remat_matches():
    params, ids = _setup(key=3)
    mesh = _mesh(2)
    sharded = PP.shard_params_pp(params, mesh)
    base = jax.jit(
        lambda p, i: PP.pipeline_forward(p, CFG, i, mesh, num_microbatches=2)
    )(sharded, ids)
    remat = jax.jit(
        lambda p, i: PP.pipeline_forward(
            p, CFG, i, mesh, num_microbatches=2, remat=True
        )
    )(sharded, ids)
    np.testing.assert_allclose(np.asarray(remat), np.asarray(base), rtol=1e-6)


def test_pipeline_rejects_bad_shapes():
    params, ids = _setup()
    mesh = _mesh(4)
    sharded = PP.shard_params_pp(params, mesh)
    try:
        PP.pipeline_forward(sharded, CFG, ids, mesh, num_microbatches=3)
        assert False, "expected ValueError"
    except ValueError:
        pass
    cfg6 = CFG.replace(num_hidden_layers=6)
    try:
        PP.pipeline_backbone(
            sharded, cfg6, ids, mesh, num_microbatches=2
        )
        assert False, "expected ValueError"
    except ValueError:
        pass
