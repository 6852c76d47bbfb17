"""KD-QAT train-step throughput (tokens/s/chip) on the real device.

The north star reports QAT tokens/s/chip (BASELINE.json; the reference
publishes no speed numbers, SURVEY.md §6). One step = frozen-teacher
forward + student quantized forward/backward (remat) + clip + AdamW — the
same fused step `cli/train.py` runs (training/trainer.py).

Usage: python benchmarks/bench_train.py [--w 4 --a 8 --kv 4] [--batch 4]
       [--seq 2048] [--steps 5] [--layers N]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B
from llm_qat_tpu.training import trainer as T


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--a", type=int, default=8)
    ap.add_argument("--kv", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--layers", type=int, default=0, help="override depth")
    ap.add_argument("--no_fused", action="store_true")
    ap.add_argument("--no_flash", action="store_true")
    args = ap.parse_args()

    cfg = TINYLLAMA_1B.replace(
        w_bits=args.w, a_bits=args.a, kv_bits=args.kv,
        use_flash_attention=not args.no_flash,
        fused_qat_matmul=not args.no_fused,
    )
    if args.layers:
        cfg = cfg.replace(num_hidden_layers=args.layers)
    tcfg = T.TrainConfig(kl_chunk=256)

    student = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    teacher = llama.init_params(
        cfg.replace(w_bits=32, a_bits=32, kv_bits=32),
        jax.random.PRNGKey(1), dtype=jnp.bfloat16,
    )
    tr = T.Trainer(cfg, tcfg, student, teacher)
    ids = jax.random.randint(
        jax.random.PRNGKey(2), (args.batch, args.seq), 0, cfg.vocab_size
    )
    batch = {"input_ids": ids, "labels": ids}

    # warmup (compile) — scalar readback is the only reliable fence on the
    # tunneled platform (see utils/benchmarking.py)
    for _ in range(2):
        float(tr.train_step(batch)["loss"])

    # steps chain through the donated state, so device work serializes;
    # one final readback fences the whole run
    t0 = time.perf_counter()
    for i in range(args.steps):
        m = tr.train_step(batch)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    toks = args.batch * args.seq
    print(
        f"W{args.w}A{args.a}KV{args.kv} b={args.batch} s={args.seq} "
        f"layers={cfg.num_hidden_layers} fused={not args.no_fused} "
        f"flash={not args.no_flash}: {dt * 1e3:.1f} ms/step, "
        f"{toks / dt:,.0f} tokens/s/chip (loss {loss:.4f})"
    )


if __name__ == "__main__":
    main()
