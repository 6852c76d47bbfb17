"""Paged engine: output parity with the contiguous engine, pool accounting,
preemption under memory pressure."""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import engine as E
from llm_qat_tpu.inference import paged as PG
from llm_qat_tpu.inference import paged_engine as PE
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST
import pytest

CFG = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
QPARAMS = Q.quantize_params(PARAMS, CFG)


def _paged(n_pages=32, max_batch=2, **kw):
    pcfg = PG.PagedConfig(page_size=8, n_pages=n_pages, max_pages_per_seq=8)
    return PE.PagedInferenceEngine(
        QPARAMS, CFG, pcfg=pcfg, max_batch=max_batch, dtype=jnp.float32, **kw
    )


@pytest.mark.slow
def test_paged_engine_matches_contiguous_engine():
    prompts = [[5, 9, 3], [7, 7], [1, 2, 3, 4]]

    ce = E.InferenceEngine(QPARAMS, CFG, max_batch=2, max_len=64, dtype=jnp.float32)
    uids_c = [ce.submit(p, max_new_tokens=5) for p in prompts]
    want = {r.uid: r.output for r in ce.run()}

    pe = _paged(max_batch=2)
    uids_p = [pe.submit(p, max_new_tokens=5) for p in prompts]
    got = {r.uid: r.output for r in pe.run()}
    assert [got[u] for u in uids_p] == [want[u] for u in uids_c]


def test_pages_released_after_completion():
    pe = _paged()
    total = pe.alloc.available
    pe.submit([1, 2, 3], max_new_tokens=4)
    pe.submit([4, 5], max_new_tokens=4)
    done = pe.run()
    assert len(done) == 2
    assert pe.alloc.available == total  # everything returned to the pool


@pytest.mark.slow
def test_preemption_under_pressure():
    """A tiny pool forces preemption; outputs must still match the
    unconstrained engine (greedy => deterministic regardless of scheduling,
    including the recompute-after-preempt path)."""
    roomy = _paged(n_pages=32, max_batch=2)
    uids_a = [roomy.submit([5, 9, 3], max_new_tokens=10),
              roomy.submit([1, 2, 3, 4], max_new_tokens=10)]
    want = {r.uid: r.output for r in roomy.run()}

    tight = _paged(n_pages=7, max_batch=2)  # 6 usable pages of 8 tokens
    uids_b = [tight.submit([5, 9, 3], max_new_tokens=10),
              tight.submit([1, 2, 3, 4], max_new_tokens=10)]
    got = {r.uid: r.output for r in tight.run()}
    assert [got[u] for u in uids_b] == [want[u] for u in uids_a]
    assert tight.alloc.available == 6


def test_pool_too_small_raises():
    pe = _paged(n_pages=2, max_batch=1)  # 1 usable page = 8 tokens
    pe.submit(list(range(1, 7)), max_new_tokens=16)
    try:
        pe.run()
        raised = False
    except MemoryError:
        raised = True
    assert raised


@pytest.mark.slow
def test_sequence_exceeding_block_table_rejected():
    """prompt + max_new beyond the per-seq table capacity is REJECTED at
    submit (VERDICT round-2 item 8: no silent truncation — a request must
    never decode from a mid-sentence prefix); a fitting request of the
    same prompt completes normally."""
    pe = _paged(n_pages=64, max_batch=1)  # max_pages_per_seq=8 * page 8 = 64
    import pytest as _pytest
    with _pytest.raises(ValueError, match="does not fit"):
        pe.submit(list(range(1, 30)), max_new_tokens=60)
    pe.submit(list(range(1, 30)), max_new_tokens=30)
    done = pe.run()
    assert len(done) == 1
    assert len(done[0].output) == 30
    assert int(pe.lengths[0]) == 0  # slot freed
    assert pe.alloc.available == 63  # all pages returned
