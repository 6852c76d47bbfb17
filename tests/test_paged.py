"""Paged KV cache: parity with the contiguous serving path, page
indirection, allocator bookkeeping."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import paged as PG
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST

CFG = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
QPARAMS = Q.quantize_params(PARAMS, CFG)
PCFG = PG.PagedConfig(page_size=8, n_pages=32, max_pages_per_seq=4)


def test_paged_matches_contiguous_prefill_and_decode():
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, CFG.vocab_size)

    # contiguous reference
    ccache = M.init_serving_cache(CFG, 2, PCFG.max_seq_len)
    want, ccache = M.serving_forward(
        QPARAMS, CFG, ids, jnp.zeros((2,), jnp.int32), jnp.ones((2,), bool),
        ccache, dtype=jnp.float32,
    )

    # paged with a *shuffled* page assignment (proves table indirection)
    pcache = PG.init_paged_cache(CFG, PCFG)
    tables = jnp.asarray([[7, 3, 0, 0], [11, 5, 0, 0]], jnp.int32)
    got, pcache = PG.paged_forward(
        QPARAMS, CFG, PCFG, ids, jnp.zeros((2,), jnp.int32),
        jnp.ones((2,), bool), tables, pcache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    # one decode token each, crossing into the second page for slot lengths 12
    tok = jax.random.randint(jax.random.PRNGKey(2), (2, 1), 0, CFG.vocab_size)
    want2, ccache = M.serving_forward(
        QPARAMS, CFG, tok, ccache["lengths"], jnp.ones((2,), bool),
        ccache, dtype=jnp.float32,
    )
    got2, pcache = PG.paged_forward(
        QPARAMS, CFG, PCFG, tok, jnp.asarray([12, 12], jnp.int32),
        jnp.ones((2,), bool), tables, pcache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4
    )


def test_paged_packed_kv4_matches_contiguous():
    """KV4 nibble-packed page pool (round 4): paged prefill+decode match
    the contiguous packed path, and the pool container is uint8 hd/2."""
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4, kv_cache_pack=True)
    qparams = Q.quantize_params(llama.init_params(cfg, jax.random.PRNGKey(0)),
                                cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)

    ccache = M.init_serving_cache(cfg, 2, PCFG.max_seq_len)
    want, ccache = M.serving_forward(
        qparams, cfg, ids, jnp.zeros((2,), jnp.int32), jnp.ones((2,), bool),
        ccache, dtype=jnp.float32,
    )

    pcache = PG.init_paged_cache(cfg, PCFG)
    assert pcache["k_q"].dtype == jnp.uint8
    assert pcache["k_q"].shape[3] == cfg.head_dim // 2
    tables = jnp.asarray([[7, 3, 0, 0], [11, 5, 0, 0]], jnp.int32)
    got, pcache = PG.paged_forward(
        qparams, cfg, PCFG, ids, jnp.zeros((2,), jnp.int32),
        jnp.ones((2,), bool), tables, pcache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    # decode step through the packed paged-attention kernel
    tok = jax.random.randint(jax.random.PRNGKey(2), (2, 1), 0, cfg.vocab_size)
    want2, ccache = M.serving_forward(
        qparams, cfg, tok, ccache["lengths"], jnp.ones((2,), bool),
        ccache, dtype=jnp.float32,
    )
    got2, pcache = PG.paged_forward(
        qparams, cfg, PCFG, tok, jnp.asarray([12, 12], jnp.int32),
        jnp.ones((2,), bool), tables, pcache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(want2), rtol=2e-4, atol=2e-4
    )


def test_paged_inactive_slot_untouched():
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 8), 0, CFG.vocab_size)
    pcache = PG.init_paged_cache(CFG, PCFG)
    tables = jnp.asarray([[1, 2, 0, 0], [3, 4, 0, 0]], jnp.int32)
    _, pcache = PG.paged_forward(
        QPARAMS, CFG, PCFG, ids, jnp.zeros((2,), jnp.int32),
        jnp.asarray([True, False]), tables, pcache, dtype=jnp.float32,
    )
    # slot 1's pages (3,4) must still be zero
    assert not np.asarray(pcache["k_q"][:, 3]).any()
    assert not np.asarray(pcache["k_q"][:, 4]).any()
    # slot 0's first page written
    assert np.asarray(pcache["k_q"][:, 1]).any()


def test_page_allocator():
    alloc = PG.PageAllocator(PCFG)
    total = PCFG.n_pages - 1  # last page reserved as scratch
    assert alloc.available == total
    a = alloc.alloc(4)
    assert len(set(a)) == 4 and alloc.available == total - 4
    alloc.release(a[:2])
    assert alloc.available == total - 2
    try:
        alloc.alloc(total)
        raised = False
    except MemoryError:
        raised = True
    assert raised


def test_paged_flash_prefill_matches_xla_prefill():
    """from_empty flash prefill must match the XLA gather-dequant path:
    logits and the pool rows it writes (s=16 is flash-eligible)."""
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, CFG.vocab_size)
    tables = jnp.asarray([[7, 3, 0, 0], [11, 5, 0, 0]], jnp.int32)
    lens = jnp.zeros((2,), jnp.int32)
    act = jnp.ones((2,), bool)

    la, ca = PG.paged_forward(
        QPARAMS, CFG.replace(use_prefill_flash=False), PCFG, ids, lens, act,
        tables, PG.init_paged_cache(CFG, PCFG), dtype=jnp.float32,
        from_empty=True,
    )
    lb, cb = PG.paged_forward(
        QPARAMS, CFG, PCFG, ids, lens, act,
        tables, PG.init_paged_cache(CFG, PCFG), dtype=jnp.float32,
        from_empty=True,
    )
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=5e-3, atol=5e-3)
    # ints can flip by 1 where a scale differs in the last ulp
    for k in ("k_q", "v_q"):
        diff = np.abs(
            np.asarray(ca[k], np.int32) - np.asarray(cb[k], np.int32)
        )
        assert diff.max() <= 1
    for k in ("k_s", "v_s"):
        np.testing.assert_allclose(np.asarray(ca[k]), np.asarray(cb[k]),
                                   rtol=1e-6)
