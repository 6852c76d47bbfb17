"""Batched beam search over the quantized serving cache.

Reference parity: the reference model carries HF ``generate`` beam-search
plumbing — ``prepare_inputs_for_generation`` builds the one-token step
inputs and ``_reorder_cache`` gathers past KV rows by ``beam_idx``
(/root/reference/models/modeling_llama_quant.py:909-954). The TPU-native
analog is a single jitted ``lax.scan``: all ``num_beams`` hypotheses decode
as one batch against the int8 serving cache (inference/model.py), and the
cache-row reorder is a batch-axis ``jnp.take`` inside the step — no host
round trip per token.

Conventions (matched by the naive oracle in tests/test_beam.py):
  * candidate pool of ``2*num_beams`` per step so EOS absorptions never
    starve the live set (HF's rule);
  * a candidate ending in EOS moves to a fixed-size finished pool (kept as
    top-``num_beams`` by normalized score); the live set takes the best
    ``num_beams`` non-EOS candidates;
  * normalized score = sum of generated-token logprobs divided by
    ``gen_len ** length_penalty`` (gen_len counts generated tokens,
    EOS included);
  * no early-stopping heuristic: the scan always runs ``max_new_tokens``
    steps and the final answer is the best of (finished pool, live beams)
    by normalized score — equivalent to HF ``early_stopping=False`` run to
    the length budget.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.models.config import LlamaConfig

NEG_INF = -1e30


def reorder_cache(cache: Dict[str, jax.Array], beam_idx: jax.Array) -> Dict[str, jax.Array]:
    """Gather cache rows by beam index (the ``_reorder_cache`` analog,
    modeling_llama_quant.py:944-954). KV tensors are ``[L, b, ...]`` so the
    batch gather is on axis 1; ``lengths`` is ``[b]``."""
    return {
        "k_q": jnp.take(cache["k_q"], beam_idx, axis=1),
        "k_s": jnp.take(cache["k_s"], beam_idx, axis=1),
        "v_q": jnp.take(cache["v_q"], beam_idx, axis=1),
        "v_s": jnp.take(cache["v_s"], beam_idx, axis=1),
        "lengths": jnp.take(cache["lengths"], beam_idx, axis=0),
    }


def _norm(scores: jax.Array, gen_len: jax.Array, length_penalty: float) -> jax.Array:
    return scores / jnp.maximum(gen_len.astype(jnp.float32), 1.0) ** length_penalty


@functools.partial(
    jax.jit,
    static_argnames=(
        "fwd", "num_beams", "max_new_tokens", "eos_id", "length_penalty"
    ),
)
def _beam_scan(
    fwd,                      # static: fn(qparams, ids, lens, active, cache)
    qparams,
    logits0: jax.Array,       # [V] — logits after the prompt's last token
    cache: Dict[str, jax.Array],   # [L, B, ...] with lengths = prompt_len
    num_beams: int,
    max_new_tokens: int,
    eos_id: Optional[int],
    length_penalty: float,
):
    B = num_beams
    V = logits0.shape[-1]
    T = max_new_tokens
    active = jnp.ones((B,), bool)

    init = dict(
        logits=jnp.broadcast_to(logits0, (B, V)),
        # only beam 0 is live at step 0 (all rows hold the same prompt)
        beam_scores=jnp.where(jnp.arange(B) == 0, 0.0, NEG_INF),
        tokens=jnp.zeros((B, T), jnp.int32),
        cache=cache,
        fin_scores=jnp.full((B,), NEG_INF),
        fin_tokens=jnp.zeros((B, T), jnp.int32),
        fin_lens=jnp.zeros((B,), jnp.int32),
    )

    def body(c, step):
        logp = jax.nn.log_softmax(c["logits"].astype(jnp.float32), axis=-1)
        cand = c["beam_scores"][:, None] + logp              # [B, V]
        scores2, idx2 = jax.lax.top_k(cand.reshape(-1), 2 * B)
        beam_idx = idx2 // V
        tok_idx = (idx2 % V).astype(jnp.int32)
        gen_len = step + 1

        # candidate token rows (EOS included when it is the sampled token)
        cand_tokens = jnp.take(c["tokens"], beam_idx, axis=0)
        cand_tokens = jax.vmap(
            lambda row, t: jax.lax.dynamic_update_index_in_dim(row, t, step, 0)
        )(cand_tokens, tok_idx)

        if eos_id is not None:
            is_eos = tok_idx == eos_id
            # merge EOS candidates into the finished pool, keep top B
            pool_scores = jnp.concatenate(
                [c["fin_scores"],
                 jnp.where(is_eos, _norm(scores2, jnp.full((2 * B,), gen_len), length_penalty), NEG_INF)]
            )
            pool_tokens = jnp.concatenate([c["fin_tokens"], cand_tokens])
            pool_lens = jnp.concatenate(
                [c["fin_lens"], jnp.full((2 * B,), gen_len, jnp.int32)]
            )
            top_scores, top_i = jax.lax.top_k(pool_scores, B)
            fin_scores = top_scores
            fin_tokens = jnp.take(pool_tokens, top_i, axis=0)
            fin_lens = jnp.take(pool_lens, top_i, axis=0)
            cont_mask = jnp.where(is_eos, NEG_INF, scores2)
        else:
            fin_scores, fin_tokens, fin_lens = (
                c["fin_scores"], c["fin_tokens"], c["fin_lens"]
            )
            cont_mask = scores2

        # live set: best B non-EOS candidates
        live_scores, live_pos = jax.lax.top_k(cont_mask, B)
        live_beam = jnp.take(beam_idx, live_pos)
        live_tok = jnp.take(tok_idx, live_pos)
        tokens = jnp.take(cand_tokens, live_pos, axis=0)

        new_cache = reorder_cache(c["cache"], live_beam)
        new_logits, new_cache = fwd(
            qparams, live_tok[:, None], new_cache["lengths"], active, new_cache
        )
        return dict(
            logits=new_logits[:, 0],
            beam_scores=live_scores,
            tokens=tokens,
            cache=new_cache,
            fin_scores=fin_scores,
            fin_tokens=fin_tokens,
            fin_lens=fin_lens,
        ), None

    out, _ = jax.lax.scan(body, init, jnp.arange(T))

    # final answer: best of finished pool vs live beams (normalized)
    live_norm = _norm(out["beam_scores"], jnp.full((B,), T), length_penalty)
    all_scores = jnp.concatenate([out["fin_scores"], live_norm])
    all_tokens = jnp.concatenate([out["fin_tokens"], out["tokens"]])
    all_lens = jnp.concatenate([out["fin_lens"], jnp.full((B,), T, jnp.int32)])
    order = jnp.argsort(-all_scores)[:B]
    return (
        jnp.take(all_tokens, order, axis=0),
        jnp.take(all_scores, order),
        jnp.take(all_lens, order),
    )


def beam_generate(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    prompt,
    *,
    num_beams: int = 4,
    max_new_tokens: int = 32,
    eos_id: Optional[int] = None,
    length_penalty: float = 1.0,
    dtype=jnp.bfloat16,
    fwd=None,
) -> Tuple[np.ndarray, float]:
    """Beam-decode one prompt; returns (tokens, normalized score) of the
    best hypothesis (tokens truncated at EOS when hit).

    ``fwd`` defaults to the single-device serving forward; pass the
    engine's tensor-parallel step (inference/sharded.make_tp_forward) to
    run the same beam over a TP mesh.
    """
    prompt = list(prompt)
    plen = len(prompt)
    if fwd is None:
        fwd = _default_fwd(config, dtype)

    # prefill once (batch-1) with the prompt padded to a pow2 bucket
    # (engine convention: bounds compile count, satisfies the decode
    # kernel's length-tiling alignment), then broadcast rows to all beams
    bucket = 16
    while bucket < plen:
        bucket *= 2
    ids = np.zeros((1, bucket), np.int32)
    ids[0, :plen] = prompt
    logits, rows = M.prefill_slot(qparams, config, jnp.asarray(ids), dtype=dtype)
    max_len = 64
    while max_len < max(bucket, plen + max_new_tokens + 1):
        max_len *= 2
    cache = M.init_serving_cache(config, num_beams, max_len)
    upd = jax.lax.dynamic_update_slice
    z = jnp.zeros((), jnp.int32)
    tile = lambda x, axis: jnp.repeat(x, num_beams, axis=axis)
    cache = {
        "k_q": upd(cache["k_q"], tile(rows["k_q"], 1), (z, z, z, z, z)),
        "k_s": upd(cache["k_s"], tile(rows["k_s"], 1), (z, z, z)),
        "v_q": upd(cache["v_q"], tile(rows["v_q"], 1), (z, z, z, z, z)),
        "v_s": upd(cache["v_s"], tile(rows["v_s"], 1), (z, z, z)),
        "lengths": jnp.full((num_beams,), plen, jnp.int32),
    }

    toks, scores, lens = _beam_scan(
        fwd, qparams, logits[0, plen - 1], cache,
        num_beams, max_new_tokens, eos_id, length_penalty,
    )
    best = np.asarray(toks[0])[: int(lens[0])]
    return best, float(scores[0])


@functools.lru_cache(maxsize=None)
def _default_fwd(config: LlamaConfig, dtype):
    # cached per (config, dtype) so _beam_scan's static fwd stays identical
    # across beam_generate calls (one compile per shape, not per call)
    def fwd(qparams, ids, lens, active, cache):
        return M.serving_forward(
            qparams, config, ids, lens, active, cache, dtype=dtype
        )

    return fwd
