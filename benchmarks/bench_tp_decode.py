"""TP-wrapper decode overhead at mesh size 1 (DESIGN.md "TP decode").

Multi-chip ICI behavior cannot be measured on the single tunneled chip;
what CAN be bounded there is the cost of the TP serving machinery itself:
`sharded.make_tp_forward` on a 1-device ('tp',) mesh runs the full
shard_map + TP-interleaved-weights + pmax'd-scales code path with every
collective degenerate. Comparing it against the plain scan decode isolates
the wrapper overhead from the parallelism.

Usage: python benchmarks/bench_tp_decode.py [--batch 8] [--ctx 2048]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.inference import sharded as S
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--fill", type=int, default=1024)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--kv", type=int, default=8)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    # the TP path runs the scan decode kernel per shard (no megakernel
    # under tp — DESIGN.md "TP decode"); compare like with like
    cfg = TINYLLAMA_1B.replace(
        w_bits=args.w, a_bits=8, kv_bits=args.kv, use_megakernel=False,
    )
    b, ctx = args.batch, args.ctx
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def measure(step, cache, qp):
        tok0 = jnp.ones((b, 1), jnp.int32)
        active = jnp.ones((b,), bool)

        @jax.jit
        def decode_n(qp, cache, tok):
            def body(carry, _):
                cache, tok = carry
                logits, cache = step(qp, tok, cache["lengths"], active, cache)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
                return (cache, tok), ()

            (cache, tok), _ = jax.lax.scan(
                body, (cache, tok), None, length=args.iters
            )
            return tok.sum()

        float(decode_n(qp, cache, tok0))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(decode_n(qp, cache, tok0))
        return (time.perf_counter() - t0) / reps / args.iters

    lengths = jnp.full((b,), args.fill, jnp.int32)

    qp1 = Q.quantize_params(params, cfg)
    c1 = dict(M.init_serving_cache(cfg, b, ctx), lengths=lengths)
    t_plain = measure(
        lambda qp, tok, lens, act, cache: M.serving_forward(
            qp, cfg, tok, lens, act, cache
        ),
        c1, qp1,
    )

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    qp2 = S.quantize_params_tp(params, cfg, 1)
    qp2 = S.place(qp2, mesh, S.qparam_specs(qp2))
    c2 = dict(
        S.init_serving_cache_tp(cfg, b, ctx, mesh), lengths=lengths
    )
    fwd = S.make_tp_forward(cfg, mesh, qp2)
    t_tp = measure(lambda qp, tok, lens, act, cache: fwd(
        qp, tok, lens, act, cache), c2, qp2)

    print(
        f"decode b={b} ctx={ctx} fill={args.fill} W{args.w}A8KV{args.kv} "
        f"(scan path): plain {t_plain * 1e3:.3f} ms/step, tp=1 shard_map "
        f"{t_tp * 1e3:.3f} ms/step -> wrapper overhead "
        f"{(t_tp - t_plain) * 1e3:+.3f} ms ({(t_tp / t_plain - 1) * 100:+.1f}%)"
    )


if __name__ == "__main__":
    main()
