"""Unrolled decode path (inference/unrolled.py): parity with the scan path.

The unrolled step must produce the same logits (up to online-softmax fp
summation order — the current token folds in as the LAST pair instead of in
cache order) and the EXACT same cache integers as the scan-based
serving_forward, for w8 and w4, pre- and post-RoPE cache modes, ragged
lengths and inactive slots.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST


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


@pytest.mark.parametrize("w_bits,rope_mode", [
    (8, "pre"),
    pytest.param(4, "pre", marks=pytest.mark.slow),
    pytest.param(8, "post", marks=pytest.mark.slow),
    pytest.param(4, "post", marks=pytest.mark.slow),
])
def test_unrolled_matches_scan_decode(w_bits, rope_mode):
    cfg = TINY_TEST.replace(
        w_bits=w_bits, a_bits=8, kv_bits=8, kv_cache_rope=rope_mode
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 3, 32
    lens = [5, 11, 8]
    cache = _prefilled(cfg, qparams, b, max_len, lens)
    np.testing.assert_array_equal(np.asarray(cache["lengths"]), lens)

    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.asarray([True, True, True])

    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    cfg_u = cfg.replace(use_unrolled_decode=True)
    lg_unr, c_unr = M.serving_forward(
        qparams, cfg_u, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )

    np.testing.assert_allclose(
        np.asarray(lg_unr), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )
    # the committed integers must be EXACTLY the scan path's
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(np.asarray(c_unr[key]), np.asarray(c_scan[key]))
    for key in ("k_s", "v_s", "lengths"):
        np.testing.assert_allclose(
            np.asarray(c_unr[key]), np.asarray(c_scan[key]), rtol=1e-6
        )


def test_unrolled_inactive_and_empty_slots():
    """Inactive slots must not advance nor corrupt their cache; an active
    slot decoding from an empty cache attends only to its own token."""
    cfg = TINY_TEST.replace(
        w_bits=8, a_bits=8, kv_bits=8, use_unrolled_decode=True
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 16
    cache = M.init_serving_cache(cfg, b, max_len)
    # slot 0: active, empty; slot 1: inactive with junk-free cache
    tok = jnp.asarray([[3], [5]], jnp.int32)
    active = jnp.asarray([True, False])
    lg, c2 = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    np.testing.assert_array_equal(np.asarray(c2["lengths"]), [1, 0])
    assert np.all(np.isfinite(np.asarray(lg)))

    # scan path ground truth for the empty-cache decode
    lg_scan, _ = M.serving_forward(
        qparams, cfg.replace(use_unrolled_decode=False), tok,
        cache["lengths"], active, cache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg[0]), np.asarray(lg_scan[0]), rtol=2e-4, atol=2e-4
    )


def test_unrolled_greedy_rollout_matches_scan():
    """Multi-step: chained greedy decode stays token-identical to the scan
    path over 8 steps (cache integers feed back into attention)."""
    cfg = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    prompt = jax.random.randint(jax.random.PRNGKey(3), (b, 4), 0, cfg.vocab_size)

    def rollout(cfg_dec):
        cache = M.init_serving_cache(cfg, b, max_len)
        active = jnp.ones((b,), bool)
        _, cache = M.serving_forward(
            qparams, cfg, prompt, cache["lengths"], active, cache,
            dtype=jnp.float32,
        )
        # feed the same fixed token first, then greedy
        tok = jnp.asarray([[1], [2]], jnp.int32)
        toks = []
        for _ in range(8):
            lg, cache = M.serving_forward(
                qparams, cfg_dec, tok, cache["lengths"], active, cache,
                dtype=jnp.float32,
            )
            tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
            toks.append(np.asarray(tok)[:, 0])
        return np.stack(toks)

    t_scan = rollout(cfg)
    t_unr = rollout(cfg.replace(use_unrolled_decode=True))
    np.testing.assert_array_equal(t_unr, t_scan)
