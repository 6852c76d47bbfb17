"""Checkpoint save/restore round-trip (SURVEY.md §4 "Trainer-level")."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.models import convert
from llm_qat_tpu.training import trainer as T
from llm_qat_tpu.utils.checkpoint import CheckpointManager
import pytest


CFG = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=8)


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    tcfg = T.TrainConfig(remat=False, compute_dtype=jnp.float32)
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    tp = llama.init_params(
        CFG.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(1)
    )
    tr = T.Trainer(CFG, tcfg, params, tp)
    batch = {
        "input_ids": jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, CFG.vocab_size)
    }
    batch["labels"] = batch["input_ids"]
    tr.train_step(batch)

    mngr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    mngr.save(1, tr.state)
    mngr.wait()
    assert mngr.latest_step() == 1

    template = jax.tree.map(np.zeros_like, tr.state)
    restored = mngr.restore(template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params,
        tr.state.params,
    )
    mngr.close()


def test_save_interval(tmp_path):
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    state = {"params": params}
    mngr = CheckpointManager(str(tmp_path / "c"), save_interval_steps=5, max_to_keep=1)
    assert mngr.maybe_save(0, state)
    assert not mngr.maybe_save(3, state)
    assert mngr.maybe_save(5, state)
    mngr.wait()
    assert mngr.latest_step() == 5
    mngr.close()


def test_hf_export_roundtrip(tmp_path):
    """convert.save_hf_checkpoint -> load_hf_checkpoint preserves params and
    bit-widths (the latent-fp artifact of utils/utils.py:39-49)."""
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    out = str(tmp_path / "hf")
    convert.save_hf_checkpoint(params, CFG, out)
    cfg2, params2 = convert.load_hf_checkpoint(out, dtype=jnp.float32)
    assert cfg2.num_hidden_layers == CFG.num_hidden_layers
    assert cfg2.kv_heads == CFG.kv_heads
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        params,
        params2,
    )
