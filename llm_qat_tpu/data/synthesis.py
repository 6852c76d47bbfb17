"""Data-free synthesis: sample the training corpus from the fp teacher.

Reference: generate_data.py (C11) + merge_gen_data.py (C12). The paper's
hybrid strategy: for every start token id, decode the first ``j in 3..5``
tokens greedily, then continue with stochastic sampling to 2048 tokens
(generate_data.py:37-43); shards are ranges of start-token ids processed in
parallel (64 shards x 500 ids = first 32k vocab, README.md:35); a killed
shard resumes from the line count of its output file (generate_data.py:25-32).

TPU-native re-design: the reference generates batch=1 through HF
``model.generate``; here generation is a single jitted ``lax.scan`` decode
loop over a fixed-size KV cache, batched over many start tokens at once
(SURVEY.md §2.3 "we batch"). Sampling matches HF generate defaults of the
reference era: temperature 1.0 with top-k 50 (GenerationConfig defaults
applied by ``do_sample=True``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig

GREEDY_LENGTHS = (3, 4, 5)  # generate_data.py:37 (j in 3..5 inclusive)


@functools.partial(
    jax.jit, static_argnames=("config", "greedy_len", "total_len", "top_k", "dtype")
)
def generate_batch(
    params,
    config: LlamaConfig,
    start_tokens: jax.Array,  # [B] int32
    key: jax.Array,
    *,
    greedy_len: int = 3,
    total_len: int = 2048,
    top_k: int = 50,
    temperature: float = 1.0,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Decode ``total_len`` tokens per row: position < greedy_len greedy,
    then top-k temperature sampling. Returns ``[B, total_len]`` ids
    (including the start token at column 0)."""
    B = start_tokens.shape[0]
    cache = llama.init_cache(config, B, total_len, dtype=dtype)
    ids0 = start_tokens[:, None].astype(jnp.int32)
    logits, cache = llama.forward_with_cache(params, config, ids0, cache, dtype=dtype)

    def sample(logits_1, step, key):
        """logits_1: [B, V]; greedy below greedy_len, else top-k sample."""
        greedy = jnp.argmax(logits_1, axis=-1).astype(jnp.int32)
        lg = logits_1 / jnp.asarray(temperature, logits_1.dtype)
        if top_k and top_k < lg.shape[-1]:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        sampled = jax.random.categorical(key, lg).astype(jnp.int32)
        # positions 1..greedy_len-1 are the "first j tokens greedy" of
        # generate_data.py:40-42 (position 0 is the forced start token)
        return jnp.where(step < greedy_len, greedy, sampled)

    def body(carry, step):
        logits, cache, key = carry
        key, sub = jax.random.split(key)
        tok = sample(logits[:, -1], step, sub)
        logits, cache = llama.forward_with_cache(
            params, config, tok[:, None], cache, dtype=dtype
        )
        return (logits, cache, key), tok

    (_, _, _), toks = jax.lax.scan(
        body, (logits, cache, key), jnp.arange(1, total_len, dtype=jnp.int32)
    )
    return jnp.concatenate([ids0, toks.T], axis=1)


def _truncate_at_eos(row: np.ndarray, eos_id: Optional[int]) -> np.ndarray:
    if eos_id is None:
        return row
    hits = np.nonzero(row == eos_id)[0]
    return row[: hits[0]] if hits.size else row


def synthesize_shard(
    params,
    config: LlamaConfig,
    shard_id: int,
    out_dir: str,
    *,
    detokenize: Callable[[Sequence[int]], str],
    n_vocab_per_shard: int = 500,      # generate_data.py:22
    batch_size: int = 32,
    total_len: int = 2048,
    eos_id: Optional[int] = 2,
    top_k: int = 50,
    seed: int = 0,
    dtype=jnp.bfloat16,
    log_every: int = 0,
) -> str:
    """Generate this shard's documents into ``gen.chunk.{NN}.jsonl``.

    Work list = [(j, start_id)] for j in GREEDY_LENGTHS and start ids in the
    shard's vocab range — identical coverage and file naming to the
    reference (generate_data.py:22-48), resumable by counting existing lines
    (generate_data.py:25-32), but executed in batches of ``batch_size``.
    """
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"gen.chunk.{shard_id:02d}.jsonl")
    start0 = shard_id * n_vocab_per_shard
    work = [
        (j, start0 + i)
        for j in GREEDY_LENGTHS
        for i in range(n_vocab_per_shard)
    ]

    done = 0
    if os.path.exists(path):
        from llm_qat_tpu.native import get_fastdata

        fd = get_fastdata()
        if fd is not None:
            done = fd.count_lines(path)
        else:
            with open(path) as f:
                done = sum(1 for _ in f)
    work = work[done:]

    with open(path, "a") as f:
        while work:
            batch = [w for w in work[:batch_size] if w[0] == work[0][0]]
            work = work[len(batch):]
            j = batch[0][0]
            starts = jnp.asarray([w[1] for w in batch], jnp.int32)
            key = jax.random.PRNGKey(seed) if seed else jax.random.PRNGKey(0)
            key = jax.random.fold_in(key, done)
            out = np.asarray(
                generate_batch(
                    params, config, starts, key,
                    greedy_len=j, total_len=total_len, top_k=top_k,
                    dtype=dtype,
                )
            )
            for row in out:
                text = detokenize(list(_truncate_at_eos(row, eos_id)))
                f.write(json.dumps({"text": text}) + "\n")
            f.flush()
            done += len(batch)
            if log_every and done % log_every < batch_size:
                print(f"shard {shard_id}: {done} docs", flush=True)
    return path


def merge_shards(gen_dir: str, out_name: str = "all_gen.jsonl") -> str:
    """Concatenate gen.chunk.*.jsonl -> all_gen.jsonl (merge_gen_data.py:14-24)."""
    out_path = os.path.join(gen_dir, out_name)
    chunks = sorted(
        f for f in os.listdir(gen_dir)
        if f.startswith("gen.chunk.") and f.endswith(".jsonl")
    )
    with open(out_path, "w") as out:
        for c in chunks:
            with open(os.path.join(gen_dir, c)) as f:
                for line in f:
                    if line.strip():
                        out.write(line.rstrip("\n") + "\n")
    return out_path
