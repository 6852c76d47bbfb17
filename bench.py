"""Benchmark driver: quantized-forward throughput on the flagship config.

Prints ONE JSON line per measurement (the driver takes the last one):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu": N}

Measures TinyLlama-1.1B-shaped W8A8KV16 fake-quant prefill throughput
(BASELINE.json config 1) on the available device. The reference publishes no
speed numbers (SURVEY.md §6), so ``vs_baseline`` is the quantized/unquantized
throughput ratio on the same hardware — the cost of fake-quant, which the
Pallas fused path drives toward (and past) 1.0.

Budget discipline (VERDICT.md round-1 item 1): the quantized-path line is
printed *before* the fp baseline is even compiled, so a driver timeout still
captures the headline number (``vs_baseline: null``); a second line with the
ratio follows if the budget allows. A persistent XLA compilation cache under
``.jax_cache/`` makes repeat runs warm-start (~seconds instead of minutes).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def time_fn(fn, *args, iters=10, warmup=1):
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
    from llm_qat_tpu.utils.profiling import chip_peak_flops, model_flops_per_token

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

    t_q = time_fn(fwd_q, params, ids)
    toks = batch * seq
    tok_per_s = toks / t_q
    # int8 peak applies: the fused QAT path carries the projections on the
    # int8 MXU (ops/pallas/qat_matmul.py); fall back to bf16 peak otherwise
    peak = chip_peak_flops(int8=cfg_q.fused_qat_matmul) if on_tpu else None
    mfu = (
        round(tok_per_s * model_flops_per_token(cfg_q, seq) / peak, 4)
        if peak
        else None
    )
    record = {
        "metric": "tinyllama1.1b_w8a8kv16_prefill_throughput",
        "value": round(tok_per_s, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": None,
        "mfu": mfu,
    }
    print(json.dumps(record), flush=True)

    # fp baseline second — a driver timeout past this point still leaves the
    # headline line above on stdout
    fwd_fp = jax.jit(
        lambda p, i: llama.forward(p, cfg_fp, i, dtype=jnp.bfloat16).mean()
    )
    t_fp = time_fn(fwd_fp, params, ids)
    record["vs_baseline"] = round(t_fp / t_q, 4)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
