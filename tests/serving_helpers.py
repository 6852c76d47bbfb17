"""Shared serving-test helpers (formerly in test_unrolled.py; the unrolled
decode study variant was deleted in round 5 — DESIGN.md keeps the study)."""

import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M


def _prefilled(cfg, qparams, b, max_len, lens, seed=0):
    """Build a cache holding ``lens`` tokens per slot via the scan path."""
    cache = M.init_serving_cache(cfg, b, max_len)
    s = int(max(lens))
    ids = jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, cfg.vocab_size)
    # prefill each slot separately to its own ragged length
    for i, n in enumerate(lens):
        active = jnp.asarray([j == i for j in range(b)])
        _, cache = M.serving_forward(
            qparams, cfg, ids[:, :n], cache["lengths"],
            active, cache, dtype=jnp.float32,
        )
    return cache
