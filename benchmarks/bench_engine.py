"""End-to-end continuous-batching throughput: the serving headline number.

Runs a mixed workload (random prompt/output lengths) through the slot
engine and the paged engine on the real device and reports generated
tokens/s — prefill + decode + scheduling included, measured at the user
API (`submit` / `run`).

Usage: python benchmarks/bench_engine.py [--requests 32] [--batch 8]
       [--w 8] [--kv 8] [--prompt-max 512] [--gen 128] [--paged-only]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax.numpy as jnp
import jax

from llm_qat_tpu.inference import engine as E
from llm_qat_tpu.inference import paged as PG
from llm_qat_tpu.inference import paged_engine as PE
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B


def run_engine(eng, prompts, gen_lens):
    t0 = time.perf_counter()
    for p, g in zip(prompts, gen_lens):
        eng.submit(list(p), max_new_tokens=int(g), temperature=0.8)
    done = eng.run()
    dt = time.perf_counter() - t0
    out_toks = sum(len(r.output) for r in done)
    in_toks = sum(len(p) for p in prompts)
    return dt, in_toks, out_toks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--w", type=int, default=8, choices=[4, 8])
    ap.add_argument("--kv", type=int, default=8)
    ap.add_argument("--prompt-max", type=int, default=512)
    ap.add_argument("--gen", type=int, default=128)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--paged-only", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = TINYLLAMA_1B.replace(w_bits=args.w, a_bits=8, kv_bits=args.kv)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qp = Q.quantize_params(params, cfg)
    del params

    rng = np.random.default_rng(args.seed)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=int(n)).tolist()
        for n in rng.integers(16, args.prompt_max + 1, size=args.requests)
    ]
    gen_lens = rng.integers(args.gen // 2, args.gen + 1, size=args.requests)

    if not args.paged_only:
        eng = E.InferenceEngine(
            qp, cfg, max_batch=args.batch, max_len=args.max_len
        )
        # warm the compile caches with a tiny run so the measurement is steady
        eng.submit(prompts[0][:16], max_new_tokens=4)
        eng.run()
        dt, tin, tout = run_engine(eng, prompts, gen_lens)
        print(
            f"slot engine:  {args.requests} reqs, {tin} prompt + {tout} gen "
            f"tokens in {dt:.2f}s -> {tout / dt:,.0f} gen tok/s "
            f"({(tin + tout) / dt:,.0f} total tok/s)"
        )

    pcfg = PG.PagedConfig(
        page_size=128,
        n_pages=args.batch * args.max_len // 128 + args.batch,
        max_pages_per_seq=args.max_len // 128,
    )
    peng = PE.PagedInferenceEngine(
        qp, cfg, pcfg=pcfg, max_batch=args.batch
    )
    peng.submit(prompts[0][:16], max_new_tokens=4)
    peng.run()
    dt, tin, tout = run_engine(peng, prompts, gen_lens)
    print(
        f"paged engine: {args.requests} reqs, {tin} prompt + {tout} gen "
        f"tokens in {dt:.2f}s -> {tout / dt:,.0f} gen tok/s "
        f"({(tin + tout) / dt:,.0f} total tok/s)"
    )


if __name__ == "__main__":
    main()
