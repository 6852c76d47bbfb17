"""Benchmark driver: quantized-forward throughput on the flagship config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures TinyLlama-1.1B-shaped W8A8KV16 fake-quant prefill throughput
(BASELINE.json config 1) on the available device. The reference publishes no
speed numbers (SURVEY.md §6), so ``vs_baseline`` is the quantized/unquantized
throughput ratio on the same hardware — the cost of fake-quant, which the
Pallas fused path drives toward (and past) 1.0.
"""

import json
import time

import jax
import jax.numpy as jnp


def time_fn(fn, *args, iters=10, warmup=2):
    """fn must return a scalar. Sync via host readback (float()): on the
    tunneled axon platform block_until_ready can return before device
    compute finishes, so only a value materialization is a reliable fence."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    from llm_qat_tpu.models import llama
    from llm_qat_tpu.models.config import TINYLLAMA_1B

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        cfg_q = TINYLLAMA_1B.replace(
            w_bits=8, a_bits=8, kv_bits=16,
            use_flash_attention=True, fused_qat_matmul=True,
        )
        batch, seq = 4, 2048
    else:  # CPU smoke: tiny shapes so the line still prints
        cfg_q = TINYLLAMA_1B.replace(
            num_hidden_layers=2, w_bits=8, a_bits=8, kv_bits=16
        )
        batch, seq = 1, 128
    cfg_fp = cfg_q.replace(w_bits=32, a_bits=32, kv_bits=32)

    params = llama.init_params(cfg_q, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0, cfg_q.vocab_size)

    # reduce to a scalar inside jit: on remote/tunneled platforms
    # block_until_ready on a large device array can return before compute
    # finishes, so timing must sync on a scalar
    fwd_q = jax.jit(
        lambda p, i: llama.forward(p, cfg_q, i, dtype=jnp.bfloat16).mean()
    )
    fwd_fp = jax.jit(
        lambda p, i: llama.forward(p, cfg_fp, i, dtype=jnp.bfloat16).mean()
    )

    t_q = time_fn(fwd_q, params, ids)
    t_fp = time_fn(fwd_fp, params, ids)

    toks = batch * seq
    print(
        json.dumps(
            {
                "metric": "tinyllama1.1b_w8a8kv16_prefill_throughput",
                "value": round(toks / t_q, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(t_fp / t_q, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
