"""Data pipeline (C7) and eval harness tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.data import dataset as D
from llm_qat_tpu.eval import zero_shot as Z
from llm_qat_tpu.eval.perplexity import evaluate_perplexity
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST


def fake_tokenize(text):
    return [ord(c) % 251 for c in text]


def test_pack_blocks_concat_and_drop():
    texts = ["abcde", "fg", "hij"]
    blocks = D.pack_blocks(texts, fake_tokenize, block_size=4)
    flat = np.concatenate([fake_tokenize(t) for t in texts])
    assert blocks.shape == (2, 4)  # 10 tokens -> 2 blocks, 2 dropped
    np.testing.assert_array_equal(blocks.reshape(-1), flat[:8])


def test_jsonl_roundtrip(tmp_path):
    p = tmp_path / "d.jsonl"
    with open(p, "w") as f:
        for i in range(30):
            f.write(json.dumps({"text": f"document number {i} body"}) + "\n")
    train, val = D.get_train_val_datasets(
        str(p), fake_tokenize, block_size=8, val_lines=10
    )
    all_texts = D.read_jsonl_texts(str(p))
    assert len(all_texts) == 30
    # val = first 10 docs, train = rest (datautils.py:51-53)
    val_flat = np.concatenate([fake_tokenize(t) for t in all_texts[:10]])
    np.testing.assert_array_equal(val.blocks.reshape(-1), val_flat[: val.blocks.size])
    assert len(train) > 0


def test_batches_shapes_and_shard():
    blocks = np.arange(160, dtype=np.int32).reshape(20, 8)
    ds = D.BlockDataset(blocks)
    bs = list(ds.batches(batch_size=6))
    assert len(bs) == 3 and bs[0]["input_ids"].shape == (6, 8)
    np.testing.assert_array_equal(bs[0]["labels"], bs[0]["input_ids"])
    s0, s1 = ds.shard(0, 2), ds.shard(1, 2)
    assert len(s0) + len(s1) == 20
    assert not np.intersect1d(s0.blocks[:, 0], s1.blocks[:, 0]).size


def test_batches_shuffle_deterministic():
    ds = D.BlockDataset(np.arange(64, dtype=np.int32).reshape(8, 8))
    a = [b["input_ids"][0, 0] for b in ds.batches(2, shuffle=True, seed=3)]
    b = [b["input_ids"][0, 0] for b in ds.batches(2, shuffle=True, seed=3)]
    assert a == b


def test_zero_shot_prefers_likely_continuation():
    """An example whose gold continuation repeats the context pattern must
    be scored correctly by... a model? Instead: verify mechanics — scoring a
    choice identical to a high-probability sequence under a *biased* model.

    We make a deterministic check: with a model whose logits are uniform,
    acc_norm equals chance only in expectation, so instead we check the
    scorer's bookkeeping directly: a choice that IS the argmax-token
    sequence of the model must win.
    """
    cfg = TINY_TEST
    params = llama.init_params(cfg, jax.random.PRNGKey(0))

    ctx = [1, 2, 3]
    # find the model's actual greedy continuation of length 2
    ids = jnp.asarray([ctx], jnp.int32)
    logits = llama.forward(params, cfg, ids)
    t1 = int(jnp.argmax(logits[0, -1]))
    logits2 = llama.forward(params, cfg, jnp.asarray([ctx + [t1]], jnp.int32))
    t2 = int(jnp.argmax(logits2[0, -1]))
    good = [t1, t2]
    # an adversarial wrong choice: least likely tokens
    b1 = int(jnp.argmin(logits[0, -1]))
    logits2b = llama.forward(params, cfg, jnp.asarray([ctx + [b1]], jnp.int32))
    b2 = int(jnp.argmin(logits2b[0, -1]))
    bad = [b1, b2]

    ex = Z.MCExample(ctx, [bad, good], gold=1)
    res = Z.score_examples(params, cfg, [ex], compute_dtype=jnp.float32)
    assert res["acc"] == 1.0 and res["acc_norm"] == 1.0


def test_task_adapters_shapes():
    tok = fake_tokenize
    ex = Z.adapt_boolq({"passage": "p", "question": "q", "answer": True}, tok)
    assert ex.gold == 1 and len(ex.choices) == 2
    ex = Z.adapt_piqa({"goal": "g", "sol1": "a", "sol2": "b", "label": 0}, tok)
    assert len(ex.choices) == 2
    ex = Z.adapt_arc(
        {"question": "q", "choices": {"label": ["A", "B"], "text": ["x", "y"]},
         "answerKey": "B"}, tok)
    assert ex.gold == 1
    ex = Z.adapt_winogrande(
        {"sentence": "the _ ran", "option1": "dog", "option2": "cat",
         "answer": "2"}, tok)
    assert ex.gold == 1 and len(ex.choices[0]) == len(tok("the dog ran"))
    ex = Z.adapt_siqa(
        {"context": "c", "question": "q", "answerA": "1", "answerB": "2",
         "answerC": "3", "label": "2"}, tok)
    assert ex.gold == 1
    ex = Z.adapt_obqa(
        {"question_stem": "q", "choices": {"label": ["A", "B", "C", "D"],
         "text": ["1", "2", "3", "4"]}, "answerKey": "C"}, tok)
    assert ex.gold == 2
    ex = Z.adapt_hellaswag({"ctx": "c", "endings": ["1", "2", "3", "4"],
                            "label": "3"}, tok)
    assert ex.gold == 3


def test_perplexity_uniform_model():
    """Random-init model on random tokens -> ppl in a sane range and
    exp(eval_loss) relation holds."""
    cfg = TINY_TEST
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 16))
    m = evaluate_perplexity(
        params, cfg, [{"input_ids": ids}], compute_dtype=jnp.float32
    )
    assert np.isclose(m["perplexity"], np.exp(m["eval_loss"]))
    assert 10 < m["perplexity"] < cfg.vocab_size * 4


def test_step_timer():
    from llm_qat_tpu.utils.profiling import StepTimer
    import time as _t

    t = StepTimer(warmup_steps=1)
    for _ in range(4):
        t.tick(tokens=100)
        _t.sleep(0.01)
    s = t.summary()
    assert s["step_time_s"] > 0 and s["tokens_per_s"] > 0
    assert t.steps_timed == 2  # 4 ticks -> 3 intervals -> 1 warmup dropped


def test_zero_shot_bucketing_mixed_lengths():
    """Mixed-length examples must score identically regardless of batching
    order (bucketing bookkeeping correctness)."""
    cfg = TINY_TEST
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    exs = []
    for i in range(6):
        ctx = list(rng.integers(1, cfg.vocab_size, 3 + 7 * (i % 3)))
        choices = [list(rng.integers(1, cfg.vocab_size, 2 + i % 2)) for _ in range(2)]
        exs.append(Z.MCExample(ctx, choices, gold=i % 2))
    a = Z.score_examples(params, cfg, exs, batch_rows=2, compute_dtype=jnp.float32)
    b = Z.score_examples(params, cfg, exs, batch_rows=16, compute_dtype=jnp.float32)
    assert a["acc"] == b["acc"] and a["acc_norm"] == b["acc_norm"]
