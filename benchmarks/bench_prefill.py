"""Serving prefill: flash from-empty fast path vs XLA whole-cache path.

Run on the real TPU. TinyLlama-1.1B shapes, W8A8KV8 true-int serving,
max_len 2048 cache, one slot prefilled per call (the engine's _admit
pattern).
"""

import time

import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B


def timeit(fn, *args, iters=5, warmup=2, **kw):
    for _ in range(warmup):
        r = fn(*args, **kw)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        float(jax.tree.leaves(r)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args, **kw)
        float(jax.tree.leaves(r)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = TINYLLAMA_1B.replace(w_bits=8, a_bits=8, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qp = Q.quantize_params(params, cfg)
    batch, max_len = 8, 2048

    for s in (128, 512, 1024):
        ids = jax.random.randint(jax.random.PRNGKey(1), (batch, s), 0,
                                 cfg.vocab_size)
        lens = jnp.zeros((batch,), jnp.int32)
        act = jnp.zeros((batch,), bool).at[0].set(True)

        cache = M.init_serving_cache(cfg, batch, max_len)
        # old engine prefill: whole-batch forward, XLA whole-cache attention
        t_old = timeit(
            M.serving_forward, qp, cfg.replace(use_prefill_flash=False),
            ids, lens, act, cache, dtype=jnp.bfloat16, from_empty=True,
        )
        # flash attention, still whole-batch
        t_flash = timeit(
            M.serving_forward, qp, cfg, ids, lens, act, cache,
            dtype=jnp.bfloat16, from_empty=True,
        )
        # new engine prefill: batch-1 slot prefill + cache splice
        def slot(qp_, ids1):
            logits, rows = M.prefill_slot(qp_, cfg, ids1, dtype=jnp.bfloat16)
            return logits

        t_slot = timeit(slot, qp, ids[:1])
        print(
            f"s={s:5d}  old={t_old*1e3:8.2f} ms  flash(b8)={t_flash*1e3:8.2f}"
            f" ms  slot(b1)={t_slot*1e3:8.2f} ms"
            f"  speedup={t_old / t_slot:5.2f}x"
            f"  ({s / t_slot:,.0f} tok/s prefill)"
        )


if __name__ == "__main__":
    main()
