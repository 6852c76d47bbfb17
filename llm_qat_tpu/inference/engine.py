"""Continuous-batching inference engine.

No reference counterpart (the reference's only generation loop is the
batch-1 synthesis script, generate_data.py:37-48); this is the north-star
serving extension: slot-based continuous batching over the true-int
quantized model (inference/model.py) with the int8 KV cache.

Design: a fixed ``[max_batch]`` slot array shares one jitted decode step
(s=1) — every wall-clock step decodes all active slots at their own
offsets. Admissions prefill a single slot with the prompt padded to a
power-of-two bucket (bounded compile count), then the slot joins the decode
batch. Completions free their slot for the next queued request. All shapes
static; raggedness lives in `seq_lens`/`active` vectors.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.models.config import LlamaConfig


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 128
    temperature: float = 0.0          # 0 => greedy
    top_k: int = 50
    eos_id: Optional[int] = None
    # filled by the engine
    output: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class InferenceEngine:
    def __init__(
        self,
        qparams,
        config: LlamaConfig,
        *,
        max_batch: int = 8,
        max_len: int = 2048,
        dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        self.qparams = qparams
        self.config = config
        self.max_batch = max_batch
        self.max_len = max_len
        self.dtype = dtype
        self.cache = M.init_serving_cache(config, max_batch, max_len)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._uid = 0
        self._key = jax.random.PRNGKey(seed)
        self._decode = jax.jit(
            lambda qp, ids, lens, act, cache: M.serving_forward(
                qp, config, ids, lens, act, cache, dtype=dtype
            )
        )

    # ------------------------------------------------------------------ API

    def submit(
        self,
        prompt: Sequence[int],
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        top_k: int = 50,
        eos_id: Optional[int] = None,
    ) -> int:
        self._uid += 1
        self.queue.append(
            Request(
                uid=self._uid,
                prompt=list(prompt),
                max_new_tokens=max_new_tokens,
                temperature=temperature,
                top_k=top_k,
                eos_id=eos_id,
            )
        )
        return self._uid

    def run(self) -> List[Request]:
        """Drain queue + slots to completion; returns finished requests."""
        finished: List[Request] = []
        while self.queue or any(s is not None for s in self.slots):
            finished.extend(self.step())
        return finished

    # ----------------------------------------------------------- internals

    def _admit(self) -> None:
        """Fill free slots from the queue (prefill path)."""
        for b, slot in enumerate(self.slots):
            if slot is not None or not self.queue:
                continue
            req = self.queue.popleft()
            # capacity: last cache row is scratch for inactive slots
            prompt = req.prompt[: self.max_len - req.max_new_tokens - 1]
            bucket = _bucket(len(prompt))
            ids = np.zeros((1, bucket), np.int32)
            ids[0, : len(prompt)] = prompt

            # reset the slot's region and prefill at offset 0; other slots
            # keep their true lengths (serving_forward passes them through
            # for inactive slots)
            self._reset_slot(b)
            lens = np.array(self.cache["lengths"])
            active = np.zeros((self.max_batch,), bool)
            active[b] = True
            ids_full = np.zeros((self.max_batch, bucket), np.int32)
            ids_full[b] = ids[0]
            logits, self.cache = self._decode(
                self.qparams,
                jnp.asarray(ids_full),
                jnp.asarray(lens),
                jnp.asarray(active),
                self.cache,
            )
            # prefill wrote `bucket` rows; trim the slot length back to the
            # real prompt (padding rows beyond it stay invalid)
            lengths = np.array(self.cache["lengths"])  # writable copy
            lengths[b] = len(prompt)
            self.cache = dict(self.cache, lengths=jnp.asarray(lengths))
            req._next_logits = np.asarray(logits[b, len(prompt) - 1])
            self.slots[b] = req

    def _reset_slot(self, b: int) -> None:
        lengths = np.array(self.cache["lengths"])  # writable copy
        lengths[b] = 0
        self.cache = dict(self.cache, lengths=jnp.asarray(lengths))

    def _sample(self, req: Request, logits: np.ndarray) -> int:
        if req.temperature <= 0.0:
            return int(np.argmax(logits))
        lg = logits / req.temperature
        if req.top_k and req.top_k < lg.shape[-1]:
            kth = np.partition(lg, -req.top_k)[-req.top_k]
            lg = np.where(lg < kth, -np.inf, lg)
        self._key, sub = jax.random.split(self._key)
        return int(jax.random.categorical(sub, jnp.asarray(lg)))

    def step(self) -> List[Request]:
        """One engine iteration: admit, decode all active slots, sample,
        retire completions."""
        self._admit()
        active_ids = [b for b, s in enumerate(self.slots) if s is not None]
        if not active_ids:
            return []

        # sample the next token per active slot from the held logits
        tokens = np.zeros((self.max_batch, 1), np.int32)
        for b in active_ids:
            req = self.slots[b]
            tok = self._sample(req, req._next_logits)
            req.output.append(tok)
            tokens[b, 0] = tok

        active = np.zeros((self.max_batch,), bool)
        active[active_ids] = True
        logits, self.cache = self._decode(
            self.qparams,
            jnp.asarray(tokens),
            self.cache["lengths"],
            jnp.asarray(active),
            self.cache,
        )
        logits_np = np.asarray(logits[:, 0])

        finished: List[Request] = []
        for b in active_ids:
            req = self.slots[b]
            req._next_logits = logits_np[b]
            hit_eos = req.eos_id is not None and req.output[-1] == req.eos_id
            full = len(req.output) >= req.max_new_tokens
            out_of_room = int(np.asarray(self.cache["lengths"])[b]) >= self.max_len - 1
            if hit_eos or full or out_of_room:
                req.done = True
                finished.append(req)
                self.slots[b] = None
        return finished
