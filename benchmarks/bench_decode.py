"""End-to-end decode-step benchmark for the serving engine.

Usage: python benchmarks/bench_decode.py [--batch 8] [--ctx 2048] [--w 8]

Measures one jitted greedy decode step (full model: weight matmuls +
quantized-KV attention + lm_head + argmax) at a fixed context fill, by
scanning ``iters`` chained steps in ONE dispatch (the cache dependency makes
the scan inherently non-hoistable). Reports ms/step and tokens/s, plus the
HBM speed-of-light floor from weight+cache traffic for context.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B

HBM_BYTES_PER_S = 819e9  # v5e


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048, help="cache capacity")
    ap.add_argument("--fill", type=int, default=1024, help="context fill at start")
    ap.add_argument("--w", type=int, default=8, choices=[4, 8])
    ap.add_argument("--kv", type=int, default=8)
    ap.add_argument("--layers", type=int, default=0, help="override layer count")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--no_kernel", action="store_true", help="XLA decode path")
    ap.add_argument(
        "--megakernel", action="store_true", default=True,
        help="whole-model decode megakernel (inference/megakernel.py) — "
        "the shipped default since round 4",
    )
    ap.add_argument(
        "--no_megakernel", dest="megakernel", action="store_false",
        help="force the scan decode path",
    )
    ap.add_argument(
        "--nc", type=int, default=0,
        help="megakernel weight-chunk width override (0 = auto/256; 512 "
        "needs a ~30+ min Mosaic compile budget)",
    )
    ap.add_argument(
        "--bk", type=int, default=0,
        help="megakernel KV-block override (0 = auto/512; smaller frees "
        "cache-buffer VMEM so NC=512 fits at b=16)",
    )
    ap.add_argument(
        "--no_kv_pack", action="store_true",
        help="keep the int8 KV container at kv_bits<=4 (every decode path "
        "including the megakernel streams the packed container since "
        "round 4; this flag exists to measure the packing win itself)",
    )
    args = ap.parse_args()

    cfg = TINYLLAMA_1B.replace(
        w_bits=args.w, a_bits=8, kv_bits=args.kv,
        use_decode_kernel=not args.no_kernel,
        use_megakernel=args.megakernel,
        kv_cache_pack=not args.no_kv_pack,
        megakernel_nc=args.nc,
        megakernel_bk=args.bk,
    )
    if args.layers:
        cfg = cfg.replace(num_hidden_layers=args.layers)
    c = cfg
    b, ctx = args.batch, args.ctx

    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = Q.quantize_params(params, cfg)
    del params

    cache = M.init_serving_cache(cfg, b, ctx)
    lengths = jnp.full((b,), args.fill, jnp.int32)
    cache = dict(cache, lengths=lengths)
    active = jnp.ones((b,), bool)
    tok0 = jnp.ones((b, 1), jnp.int32)

    @jax.jit
    def decode_n(qp, cache, tok):
        def body(carry, _):
            cache, tok = carry
            logits, cache = M.serving_forward(
                qp, cfg, tok, cache["lengths"], active, cache
            )
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
            return (cache, tok), ()

        (cache, tok), _ = jax.lax.scan(body, (cache, tok), None, length=args.iters)
        return tok.sum()

    float(decode_n(qparams, cache, tok0))  # compile+warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(decode_n(qparams, cache, tok0))
    dt = (time.perf_counter() - t0) / reps / args.iters

    # speed-of-light: weight bytes + live KV bytes per step
    H, I, L, V = c.hidden_size, c.intermediate_size, c.num_hidden_layers, c.vocab_size
    kv_dim = c.kv_heads * c.head_dim
    wbytes_layer = H * (H + 2 * kv_dim) + H * H + 2 * H * I + I * H
    wbytes = L * wbytes_layer * (0.5 if args.w == 4 else 1) + V * H * 2  # head bf16
    packed = cfg.kv_cache_pack and cfg.kv_bits <= 4
    # K+V bytes read per step: int8 container, or half at KV4 nibble-packed
    kvbytes = L * b * args.fill * 2 * kv_dim * (0.5 if packed else 1)
    sol = (wbytes + kvbytes) / HBM_BYTES_PER_S

    print(
        f"decode b={b} ctx={ctx} fill={args.fill} W{args.w}A8KV{args.kv} "
        f"L={c.num_hidden_layers}: {dt * 1e3:.3f} ms/step  "
        f"{b / dt:.0f} tok/s  SoL={sol * 1e3:.3f} ms ({sol / dt * 100:.0f}% of SoL)"
    )


if __name__ == "__main__":
    main()
