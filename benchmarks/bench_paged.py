"""Paged vs contiguous decode on the real chip (VERDICT r4 next #7/#8).

The contiguous path's fast route is the whole-model megakernel; paged
decode runs per-layer block-table kernels over the shared page pool.
This bench puts numbers on that gap at matched shapes — the measured
basis for the paged-megakernel decision — and sweeps context length for
the long-context serving curve.

Usage:
  python benchmarks/bench_paged.py [--w 4 --kv 4 --batch 8] \
      [--fills 1024,2040] [--page 64]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=4)
    ap.add_argument("--kv", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--fills", default="1024")
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    from llm_qat_tpu.inference import paged as PG
    from llm_qat_tpu.models.config import TINYLLAMA_1B
    from benchmarks.bench_7b import synth_qparams

    fills = [int(f) for f in args.fills.split(",")]
    max_fill = max(fills) + 8
    b = args.batch
    cfg = TINYLLAMA_1B.replace(w_bits=args.w, a_bits=8, kv_bits=args.kv)
    pcfg = PG.PagedConfig(
        page_size=args.page,
        max_pages_per_seq=-(-max_fill // args.page),
        n_pages=b * (-(-max_fill // args.page)) + 1,
    )
    qparams = synth_qparams(cfg, jax.random.PRNGKey(0))
    active = jnp.ones((b,), bool)

    # every slot owns a dense run of pages (worst-case fragmentation is a
    # scheduler property, not a kernel one)
    bt = (jnp.arange(b)[:, None] * pcfg.max_pages_per_seq
          + jnp.arange(pcfg.max_pages_per_seq)[None, :]).astype(jnp.int32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(qp, cache, lens, tok):
        logits, cache = PG._forward(
            qp, cfg, pcfg, tok, lens, active, bt, cache
        )
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
        return tok, cache

    for fill in fills:
        cache = PG.init_paged_cache(cfg, pcfg)
        lens = jnp.full((b,), fill, jnp.int32)
        tok = jnp.ones((b, 1), jnp.int32)
        tok, cache = step(qparams, cache, lens, tok)
        float(tok.sum())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tok, cache = step(qparams, cache, lens, tok)
        float(tok.sum())
        t = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "metric": f"tinyllama_w{args.w}a8kv{args.kv}_paged_decode_ms",
            "value": round(t * 1e3, 3), "unit": "ms/step",
            "batch": b, "fill": fill, "page_size": args.page,
        }), flush=True)
        del cache


if __name__ == "__main__":
    main()
