"""Zero-shot multiple-choice evaluation harness.

The reference publishes zero-shot accuracy on 8 common-sense tasks (boolq,
piqa, siqa, hellaswag, winogrande, arc_easy, arc_challenge, obqa;
README.md:45-54) but contains no harness — the numbers came from an external
lm-eval run (SURVEY.md §3.5). This module supplies the capability natively:
loglikelihood scoring of answer choices under the quantized model, with both
raw and length-normalized accuracy (lm-eval's ``acc`` / ``acc_norm``).

Batching is TPU-shaped: all (context, choice) rows are right-padded into
fixed ``[rows_per_batch, max_len]`` buckets so one jitted forward serves the
whole task; per-row continuation log-probs are gathered with a mask, no
dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig


@dataclasses.dataclass
class MCExample:
    """One multiple-choice item.

    Two layouts:
    - shared context (``ctx_lens is None``): ``context`` holds the context
      token ids shared by all choices and each entry of ``choices`` is a
      continuation; the scored row is ``context + choice``.
    - per-choice context (``ctx_lens`` set — winogrande's lm-eval "partial
      evaluation" scheme, where the option lives in the *context*): each
      entry of ``choices`` is already the FULL row (context + continuation)
      and ``ctx_lens[i]`` is how many leading tokens are context; only the
      remaining suffix tokens are scored.
    """

    context: Sequence[int]
    choices: Sequence[Sequence[int]]
    gold: int
    ctx_lens: Optional[Sequence[int]] = None


def _logprob_fn(config: LlamaConfig, compute_dtype):
    """Jitted scorer: rows [b, s], mask [b, s], target-mask [b, s] ->
    per-row sum and count of target-token logprobs."""

    def fn(params, ids, attn_mask, tgt_mask):
        logits = llama.forward(
            params, config, ids, attention_mask=attn_mask, dtype=compute_dtype
        )
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = ids[:, 1:]
        row = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        m = tgt_mask[:, 1:].astype(jnp.float32)
        return jnp.sum(row * m, axis=-1), jnp.sum(m, axis=-1)

    return jax.jit(fn)


def score_examples(
    params,
    config: LlamaConfig,
    examples: Sequence[MCExample],
    *,
    batch_rows: int = 16,
    max_len: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    return_scores: bool = False,
) -> Dict[str, float]:
    """Score every (context, choice) row, pick argmax per example.

    Returns ``acc`` (raw loglikelihood argmax) and ``acc_norm``
    (per-token-length normalized, lm-eval convention); with
    ``return_scores`` also the per-example summed-logprob matrix (lm-eval's
    per-doc loglikelihoods).
    """
    rows: List[np.ndarray] = []
    row_meta: List[tuple] = []  # (example_idx, choice_idx, ctx_len)
    for ei, ex in enumerate(examples):
        for ci, cont in enumerate(ex.choices):
            if ex.ctx_lens is not None:
                ids = list(cont)  # cont is already the full row
                ctx_len = ex.ctx_lens[ci]
            else:
                ids = list(ex.context) + list(cont)
                ctx_len = len(ex.context)
            rows.append(np.asarray(ids, np.int32))
            row_meta.append((ei, ci, ctx_len))

    scores = np.full((len(examples), max(len(e.choices) for e in examples)), -np.inf)
    norm_scores = np.full_like(scores, -np.inf)
    fn = _logprob_fn(config, compute_dtype)

    def pow2_bucket(n: int, lo: int = 32) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    # bucket rows by pow2 length so short rows don't pay the longest row's
    # compute, and the jit compiles once per bucket (TPU-friendly shapes)
    order = sorted(range(len(rows)), key=lambda i: len(rows[i]))
    for start in range(0, len(order), batch_rows):
        idxs = order[start : start + batch_rows]
        longest = max(len(rows[i]) for i in idxs)
        blen = min(pow2_bucket(longest), max_len) if max_len else pow2_bucket(longest)
        b = len(idxs)
        ids = np.zeros((batch_rows, blen), np.int32)
        attn = np.zeros((batch_rows, blen), np.int32)
        tmask = np.zeros((batch_rows, blen), np.int32)
        for i, ri in enumerate(idxs):
            r = rows[ri]
            ctx_len = row_meta[ri][2]
            L = min(len(r), blen)
            ids[i, :L] = r[:L]
            attn[i, :L] = 1
            tmask[i, min(ctx_len, L) : L] = 1
        s, cnt = fn(params, jnp.asarray(ids), jnp.asarray(attn), jnp.asarray(tmask))
        s, cnt = np.asarray(s), np.asarray(cnt)
        for i, ri in enumerate(idxs):
            ei, ci, _ = row_meta[ri]
            scores[ei, ci] = s[i]
            norm_scores[ei, ci] = s[i] / max(cnt[i], 1)

    golds = np.asarray([e.gold for e in examples])
    acc = float(np.mean(np.argmax(scores, axis=-1) == golds))
    acc_norm = float(np.mean(np.argmax(norm_scores, axis=-1) == golds))
    out = {"acc": acc, "acc_norm": acc_norm, "n": len(examples)}
    if return_scores:
        out["scores"] = scores  # [n_examples, max_choices] summed logprobs
    return out


# ---------------------------------------------------------------------------
# Task adapters: raw task jsonl -> MCExample
# ---------------------------------------------------------------------------

Tokenize = Callable[[str], Sequence[int]]


def _mc(tokenize: Tokenize, ctx: str, choices: Sequence[str], gold: int) -> MCExample:
    # lm-eval convention: continuation carries the leading space; the
    # context is tokenized alone, the continuation tokens are the suffix of
    # tokenizing ctx+choice (robust to tokenizers merging at the boundary).
    ctx_ids = list(tokenize(ctx))
    conts = []
    for ch in choices:
        full = list(tokenize(ctx + ch))
        conts.append(full[len(ctx_ids):] if full[: len(ctx_ids)] == ctx_ids else tokenize(ch))
    return MCExample(ctx_ids, conts, gold)


def adapt_boolq(doc: dict, tokenize: Tokenize) -> MCExample:
    ctx = f"{doc['passage']}\nQuestion: {doc['question']}?\nAnswer:"
    return _mc(tokenize, ctx, [" no", " yes"], int(doc["answer"]))


def adapt_piqa(doc: dict, tokenize: Tokenize) -> MCExample:
    ctx = f"Question: {doc['goal']}\nAnswer:"
    return _mc(tokenize, ctx, [" " + doc["sol1"], " " + doc["sol2"]], int(doc["label"]))


def _hellaswag_preprocess(text: str) -> str:
    """lm-eval's hellaswag text cleanup (detokenizer artifacts in the
    source data): strip, '[title]' -> '. ', drop other bracketed tags,
    collapse double spaces."""
    text = text.strip()
    text = text.replace(" [title]", ". ")
    text = re.sub(r"\[.*?\]", "", text)
    text = text.replace("  ", " ")
    return text


def adapt_hellaswag(doc: dict, tokenize: Tokenize) -> MCExample:
    # lm-eval convention: context = "<activity_label>: <ctx_a> <Ctx_b...>"
    # (ctx_b capitalized), both context and endings run through the
    # preprocessor. Falls back to raw ``ctx`` when the split fields are
    # absent from the doc.
    if "ctx_a" in doc or "activity_label" in doc:
        ctx_b = doc.get("ctx_b", "")
        ctx = doc.get("ctx_a", doc.get("ctx", ""))
        if ctx_b:
            ctx = ctx + " " + ctx_b.capitalize()
        label = doc.get("activity_label", "")
        if label:
            ctx = label + ": " + ctx
    else:
        ctx = doc["ctx"]
    ctx = _hellaswag_preprocess(ctx)
    endings = [_hellaswag_preprocess(e) for e in doc["endings"]]
    return _mc(tokenize, ctx, [" " + e for e in endings], int(doc["label"]))


_ARC_NUM_TO_LETTER = {"1": "A", "2": "B", "3": "C", "4": "D", "5": "E"}


def adapt_arc(doc: dict, tokenize: Tokenize) -> MCExample:
    ctx = f"Question: {doc['question']}\nAnswer:"
    # lm-eval normalizes numeric answer keys ("1".."5") to letters
    key = _ARC_NUM_TO_LETTER.get(str(doc["answerKey"]), doc["answerKey"])
    labels = [_ARC_NUM_TO_LETTER.get(str(l), l) for l in doc["choices"]["label"]]
    texts = doc["choices"]["text"]
    gold = labels.index(key)
    return _mc(tokenize, ctx, [" " + t for t in texts], gold)


def adapt_winogrande(doc: dict, tokenize: Tokenize) -> MCExample:
    # lm-eval "partial evaluation" (the convention behind the published
    # table): context = sentence up to the blank with the option
    # substituted, continuation = everything after the blank. The option
    # lives in the CONTEXT, so the scored suffix tokens are identical
    # across choices and only the conditioning differs.
    idx = doc["sentence"].index("_")
    prefix = doc["sentence"][:idx]
    suffix = doc["sentence"][idx + 1 :]
    options = [doc["option1"], doc["option2"]]
    gold = int(doc["answer"]) - 1
    rows, ctx_lens = [], []
    for opt in options:
        ctx_ids = list(tokenize(prefix + opt))
        full = list(tokenize(prefix + opt + suffix))
        # tokenizer may merge at the option/suffix boundary; lm-eval slices
        # continuation tokens out of the whole-sentence tokenization, so
        # align by longest common prefix rather than retokenizing the
        # suffix standalone (which could differ across choices)
        lcp = 0
        for a, b in zip(full, ctx_ids):
            if a != b:
                break
            lcp += 1
        rows.append(full)
        ctx_lens.append(lcp)
    return MCExample([], rows, gold, ctx_lens=ctx_lens)


def adapt_siqa(doc: dict, tokenize: Tokenize) -> MCExample:
    # lm-eval social_iqa: "Question: <context> <question>\nAnswer:"
    ctx = f"Question: {doc['context']} {doc['question']}\nAnswer:"
    choices = [" " + doc["answerA"], " " + doc["answerB"], " " + doc["answerC"]]
    return _mc(tokenize, ctx, choices, int(doc["label"]) - 1)


def adapt_obqa(doc: dict, tokenize: Tokenize) -> MCExample:
    ctx = doc["question_stem"]
    labels = doc["choices"]["label"]
    texts = doc["choices"]["text"]
    gold = labels.index(doc["answerKey"])
    return _mc(tokenize, ctx, [" " + t for t in texts], gold)


TASK_ADAPTERS = {
    "boolq": adapt_boolq,
    "piqa": adapt_piqa,
    "siqa": adapt_siqa,
    "hellaswag": adapt_hellaswag,
    "winogrande": adapt_winogrande,
    "arc_easy": adapt_arc,
    "arc_challenge": adapt_arc,
    "obqa": adapt_obqa,
}


def evaluate_task(
    params,
    config: LlamaConfig,
    task: str,
    docs: Sequence[dict],
    tokenize: Tokenize,
    **kw,
) -> Dict[str, float]:
    adapter = TASK_ADAPTERS[task]
    examples = [adapter(d, tokenize) for d in docs]
    return score_examples(params, config, examples, **kw)
