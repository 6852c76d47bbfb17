"""Post-RoPE serving cache mode (config.kv_cache_rope = "post").

"pre" (default) stores pre-RoPE integers — the training hook point
(modeling_llama_quant.py:320-333) — and re-applies RoPE on every read.
"post" rotates K at its absolute position BEFORE quantizing so reads skip
RoPE entirely. The two modes differ only by where the rounding lands
(quantize-then-rotate vs rotate-then-quantize), so logits agree to
quantization noise; within "post" mode the kernel and XLA paths must agree
tightly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.inference import model as M, paged as PG, quantized as Q
import pytest

CFG = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
QPARAMS = Q.quantize_params(PARAMS, CFG)


def _run_contiguous(cfg, steps=3):
    B, L = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 4), 0, cfg.vocab_size)
    act = jnp.ones((B,), bool)
    cache = M.init_serving_cache(cfg, B, L)
    lg, cache = M.serving_forward(
        QPARAMS, cfg, ids, jnp.zeros((B,), jnp.int32), act, cache,
        dtype=jnp.float32,
    )
    outs = [lg[:, -1]]
    for _ in range(steps):
        tok = jnp.argmax(outs[-1], -1)[:, None].astype(jnp.int32)
        lg, cache = M.serving_forward(
            QPARAMS, cfg, tok, cache["lengths"], act, cache, dtype=jnp.float32
        )
        outs.append(lg[:, 0])
    return jnp.stack(outs), cache


def test_post_mode_close_to_pre_mode():
    lg_pre, _ = _run_contiguous(CFG)
    lg_post, _ = _run_contiguous(CFG.replace(kv_cache_rope="post"))
    # same computation up to where the KV rounding lands; tiny-model logits
    # are O(1) so an absolute tolerance of ~0.1 is quantization noise
    np.testing.assert_allclose(lg_pre, lg_post, atol=0.15, rtol=0.1)
    assert float(jnp.max(jnp.abs(lg_pre - lg_post))) > 0  # genuinely different rounding


def test_post_mode_kernel_matches_xla_path():
    """Within post mode the fused decode kernel (rope=False) and the XLA
    path read the same rotated integers — tight agreement."""
    cfg_k = CFG.replace(kv_cache_rope="post", use_decode_kernel=True)
    cfg_x = CFG.replace(kv_cache_rope="post", use_decode_kernel=False)
    lg_k, ck = _run_contiguous(cfg_k)
    lg_x, cx = _run_contiguous(cfg_x)
    np.testing.assert_allclose(lg_k, lg_x, atol=5e-4, rtol=5e-4)
    np.testing.assert_array_equal(np.asarray(ck["k_q"]), np.asarray(cx["k_q"]))


@pytest.mark.slow
def test_post_mode_paged_matches_contiguous():
    cfg = CFG.replace(kv_cache_rope="post")
    pcfg = PG.PagedConfig(page_size=8, n_pages=16, max_pages_per_seq=4)
    B = 2
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 4), 0, cfg.vocab_size)
    act = jnp.ones((B,), bool)
    tables = jnp.array([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)

    cache_c = M.init_serving_cache(cfg, B, 32)
    lg_c, cache_c = M.serving_forward(
        QPARAMS, cfg, ids, jnp.zeros((B,), jnp.int32), act, cache_c,
        dtype=jnp.float32,
    )
    cache_p = PG.init_paged_cache(cfg, pcfg)
    lg_p, cache_p = PG.paged_forward(
        QPARAMS, cfg, pcfg, ids, jnp.zeros((B,), jnp.int32), act, tables,
        cache_p, dtype=jnp.float32,
    )
    np.testing.assert_allclose(lg_c, lg_p, atol=5e-4, rtol=5e-4)

    tok = jnp.argmax(lg_c[:, -1], -1)[:, None].astype(jnp.int32)
    lens = jnp.full((B,), 4, jnp.int32)
    lg_cd, _ = M.serving_forward(
        QPARAMS, cfg, tok, lens, act, cache_c, dtype=jnp.float32
    )
    lg_pd, _ = PG.paged_forward(
        QPARAMS, cfg, pcfg, tok, lens, act, tables, cache_p, dtype=jnp.float32
    )
    np.testing.assert_allclose(lg_cd, lg_pd, atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_kv16_serving_clamps_to_int8_storage():
    """kv_bits=16 serving must quantize at 8 bits (the cache is int8) —
    previously it wrapped around int8 and corrupted the cache."""
    lg16, c16 = _run_contiguous(CFG.replace(kv_bits=16))
    lg8, c8 = _run_contiguous(CFG)  # kv_bits=8
    np.testing.assert_array_equal(np.asarray(c16["k_q"]), np.asarray(c8["k_q"]))
    np.testing.assert_allclose(lg16, lg8, atol=1e-6)
