"""Perplexity evaluation: ``exp(mean CE)`` over fixed blocks.

Reference: train.py:131-143 — `trainer.evaluate()` with the default label-CE
loss, then ``metrics["perplexity"] = exp(eval_loss)``, on jsonl blocks of
size ≤1024 (train.py:108-110).
"""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig


def evaluate_perplexity(
    params,
    config: LlamaConfig,
    batches: Iterable[dict],
    compute_dtype=jnp.bfloat16,
) -> Dict[str, float]:
    """Mean shifted-CE over batches -> {'eval_loss', 'perplexity'}."""

    @jax.jit
    def step(params, ids):
        logits = llama.forward(params, config, ids, dtype=compute_dtype)
        return llama.causal_lm_loss(logits, ids)

    losses = []
    for batch in batches:
        ids = jnp.asarray(np.asarray(batch["input_ids"], np.int32))
        losses.append(float(step(params, ids)))
    mean = float(np.mean(losses)) if losses else float("nan")
    return {"eval_loss": mean, "perplexity": float(np.exp(mean))}
