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
    assert ex.ctx_lens == [len(tok("the dog")), len(tok("the cat"))]
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


def test_adapter_token_splits_lm_eval_convention():
    """VERDICT round-1 item 4: assert the exact context/continuation token
    split for all 8 task adapters against lm-eval scoring conventions, with
    a character-level tokenizer so splits are byte-exact."""
    tok = fake_tokenize

    def split(ex):
        """-> list of (context_ids, continuation_ids) per choice."""
        out = []
        for ci, ch in enumerate(ex.choices):
            if ex.ctx_lens is not None:
                out.append((list(ch[: ex.ctx_lens[ci]]), list(ch[ex.ctx_lens[ci]:])))
            else:
                out.append((list(ex.context), list(ch)))
        return out

    # boolq: ctx = "<passage>\nQuestion: <q>?\nAnswer:", conts " no"/" yes"
    ex = Z.adapt_boolq({"passage": "P.", "question": "is it", "answer": False}, tok)
    want_ctx = tok("P.\nQuestion: is it?\nAnswer:")
    assert split(ex) == [(want_ctx, tok(" no")), (want_ctx, tok(" yes"))]
    assert ex.gold == 0

    # piqa: ctx = "Question: <goal>\nAnswer:", conts " <sol>"
    ex = Z.adapt_piqa({"goal": "open jar", "sol1": "twist", "sol2": "smash",
                       "label": 1}, tok)
    want_ctx = tok("Question: open jar\nAnswer:")
    assert split(ex) == [(want_ctx, tok(" twist")), (want_ctx, tok(" smash"))]

    # siqa: ctx = "Question: <context> <question>\nAnswer:" (lm-eval social_iqa)
    ex = Z.adapt_siqa({"context": "C.", "question": "why", "answerA": "a",
                       "answerB": "b", "answerC": "c", "label": "3"}, tok)
    want_ctx = tok("Question: C. why\nAnswer:")
    assert split(ex)[2] == (want_ctx, tok(" c")) and ex.gold == 2

    # hellaswag: ctx = "<activity>: <ctx_a> <Ctx_b>", preprocessed endings
    ex = Z.adapt_hellaswag(
        {"activity_label": "Cooking", "ctx_a": "He stirs.", "ctx_b": "then",
         "endings": ["eats [step] fast", "x [title] y", "a  b", "z"],
         "label": "0"}, tok)
    want_ctx = tok("Cooking: He stirs. Then")
    got = split(ex)
    assert got[0] == (want_ctx, tok(" eats fast"))      # [step] dropped, "  "->" "
    assert got[1] == (want_ctx, tok(" x. y"))           # " [title]" -> ". "
    assert got[2] == (want_ctx, tok(" a b"))

    # hellaswag fallback on raw ctx docs
    ex = Z.adapt_hellaswag({"ctx": "raw", "endings": ["e"], "label": 0}, tok)
    assert split(ex)[0] == (tok("raw"), tok(" e"))

    # winogrande: PARTIAL EVALUATION — ctx = prefix+option, cont = suffix
    ex = Z.adapt_winogrande(
        {"sentence": "the _ ran home", "option1": "dog", "option2": "cat",
         "answer": "1"}, tok)
    assert split(ex) == [
        (tok("the dog"), tok(" ran home")),
        (tok("the cat"), tok(" ran home")),
    ]
    assert ex.gold == 0

    # arc: numeric answer keys normalize to letters
    ex = Z.adapt_arc(
        {"question": "q", "choices": {"label": ["1", "2", "3"],
         "text": ["x", "y", "z"]}, "answerKey": "3"}, tok)
    want_ctx = tok("Question: q\nAnswer:")
    assert ex.gold == 2 and split(ex)[2] == (want_ctx, tok(" z"))

    # obqa: ctx = question_stem, conts " <choice>"
    ex = Z.adapt_obqa(
        {"question_stem": "The sun is", "choices": {"label": ["A", "B"],
         "text": ["hot", "cold"]}, "answerKey": "A"}, tok)
    assert split(ex) == [(tok("The sun is"), tok(" hot")),
                         (tok("The sun is"), tok(" cold"))]


def test_score_examples_per_choice_context():
    """ctx_lens layout: identical suffixes under different contexts score
    the conditioning, and bookkeeping matches the shared-context layout."""
    cfg = TINY_TEST
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ctx_a, ctx_b, suffix = [1, 2, 3], [4, 5], [6, 7]
    ex_pc = Z.MCExample([], [ctx_a + suffix, ctx_b + suffix], gold=0,
                        ctx_lens=[len(ctx_a), len(ctx_b)])
    # equivalent shared-context scoring of each row done by hand
    ex_a = Z.MCExample(ctx_a, [suffix], gold=0)
    ex_b = Z.MCExample(ctx_b, [suffix], gold=0)
    r_pc = Z.score_examples(params, cfg, [ex_pc], compute_dtype=jnp.float32)
    # winner under per-choice layout == argmax of the two manual scores
    la = Z.score_examples(params, cfg, [ex_a], compute_dtype=jnp.float32)
    lb = Z.score_examples(params, cfg, [ex_b], compute_dtype=jnp.float32)
    # scores themselves aren't returned; check via acc with gold set both ways
    ex_pc2 = Z.MCExample([], [ctx_a + suffix, ctx_b + suffix], gold=1,
                         ctx_lens=[len(ctx_a), len(ctx_b)])
    r2 = Z.score_examples(params, cfg, [ex_pc2], compute_dtype=jnp.float32)
    assert r_pc["acc"] + r2["acc"] == 1.0  # exactly one gold assignment wins
    assert la["n"] == lb["n"] == 1


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
