"""Beam search over the serving cache vs a naive Python oracle.

The oracle re-derives next-token logits for every live hypothesis with a
from-empty batch-1 prefill (no incremental cache, no batching, no
reordering), and applies the same candidate rules as inference/beam.py:
2B-candidate pool, EOS absorption into a finished pool, normalized score
sum_logp / gen_len**length_penalty.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.inference import beam as B
from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST

CFG = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(7))
QPARAMS = Q.quantize_params(PARAMS, CFG)


def _last_logits(ids):
    bucket = 16
    while bucket < len(ids):
        bucket *= 2
    padded = np.zeros((1, bucket), np.int32)
    padded[0, : len(ids)] = ids
    logits, _ = M.prefill_slot(
        QPARAMS, CFG, jnp.asarray(padded), dtype=jnp.float32
    )
    return np.asarray(logits[0, len(ids) - 1], np.float64)


def naive_beam(prompt, num_beams, max_new, eos_id, length_penalty):
    def logsoftmax(x):
        x = x - x.max()
        return x - np.log(np.exp(x).sum())

    live = [(tuple(), 0.0)]  # (generated tokens, score)
    finished = []            # (norm score, tokens)
    for step in range(max_new):
        cands = []
        for gen, score in live:
            logp = logsoftmax(_last_logits(list(prompt) + list(gen)))
            for v in np.argsort(-logp)[: 2 * num_beams]:
                cands.append((score + logp[v], gen + (int(v),)))
        cands.sort(key=lambda c: -c[0])
        cands = cands[: 2 * num_beams]
        new_live = []
        for score, gen in cands:
            if eos_id is not None and gen[-1] == eos_id:
                finished.append((score / len(gen) ** length_penalty, gen))
            elif len(new_live) < num_beams:
                new_live.append((gen, score))
        live = new_live
    for gen, score in live:
        finished.append((score / max_new ** length_penalty, gen))
    finished.sort(key=lambda c: -c[0])
    return list(finished[0][1]), finished[0][0]


@pytest.mark.parametrize("eos_id,lp", [(None, 1.0), (3, 1.0), (3, 0.7)])
def test_beam_matches_naive_oracle(eos_id, lp):
    prompt = [5, 9, 2, 14]
    got_toks, got_score = B.beam_generate(
        QPARAMS, CFG, prompt, num_beams=3, max_new_tokens=6,
        eos_id=eos_id, length_penalty=lp, dtype=jnp.float32,
    )
    want_toks, want_score = naive_beam(prompt, 3, 6, eos_id, lp)
    assert list(got_toks) == want_toks
    assert np.isclose(got_score, want_score, rtol=1e-4, atol=1e-5)


def test_beam1_equals_greedy():
    """num_beams=1 degenerates to greedy decode."""
    prompt = [1, 2, 3]
    toks, _ = B.beam_generate(
        QPARAMS, CFG, prompt, num_beams=1, max_new_tokens=5,
        dtype=jnp.float32,
    )
    greedy = []
    ids = list(prompt)
    for _ in range(5):
        nxt = int(np.argmax(_last_logits(ids)))
        greedy.append(nxt)
        ids.append(nxt)
    assert list(toks) == greedy


def test_reorder_cache_gathers_rows():
    cache = M.init_serving_cache(CFG, 3, 8)
    cache = dict(cache, lengths=jnp.asarray([1, 2, 3], jnp.int32))
    k = np.array(cache["k_q"])
    k[:, 1] = 7
    cache["k_q"] = jnp.asarray(k)
    out = B.reorder_cache(cache, jnp.asarray([1, 1, 0]))
    assert np.all(np.asarray(out["k_q"])[:, 0] == 7)
    assert np.all(np.asarray(out["k_q"])[:, 1] == 7)
    assert np.all(np.asarray(out["k_q"])[:, 2] == 0)
    assert list(np.asarray(out["lengths"])) == [2, 2, 1]
