"""Microbench: fused int8-KV decode attention kernel vs the XLA path.

Times just the attention op (per layer) at serving shapes, with the scan
harness. The XLA comparator mirrors inference/model.py's fallback: dequant
the whole head-major cache, RoPE, full-matrix softmax.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import decode_attention as DA
from llm_qat_tpu.utils.benchmarking import dispatch_floor, measure

HBM = 819e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--fill", type=int, default=1024)
    ap.add_argument("--kvh", type=int, default=4)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--bk", type=int, default=1024)
    args = ap.parse_args()
    b, S, hd, kvh, groups = args.batch, args.ctx, args.hd, args.kvh, args.groups

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, kvh * groups, hd), jnp.bfloat16)
    k_q = jax.random.randint(key, (b, kvh, S, hd), -127, 128, jnp.int8)
    v_q = jax.random.randint(key, (b, kvh, S, hd), -127, 128, jnp.int8)
    k_s = jax.random.uniform(key, (b, S), jnp.float32, 0.005, 0.02)
    v_s = jax.random.uniform(key, (b, S), jnp.float32, 0.005, 0.02)
    lengths = jnp.full((b,), args.fill, jnp.int32)

    floor = dispatch_floor(iters=args.iters)
    t_kernel = measure(
        lambda q, kq, ks, vq, vs: DA.quantized_decode_attention(
            q, kq, ks, vq, vs, lengths, bk=args.bk
        ),
        (q, k_q, k_s, v_q, v_s),
        iters=args.iters,
        floor=floor,
    )
    t_xla = measure(
        lambda q, kq, ks, vq, vs: DA.decode_attention_reference(
            q.astype(jnp.float32), kq, ks, vq, vs, lengths
        ).astype(jnp.bfloat16),
        (q, k_q, k_s, v_q, v_s),
        iters=args.iters,
        floor=floor,
    )
    live = b * kvh * args.fill * hd * 2  # int8 K+V actually attended
    sol = live / HBM
    print(
        f"decode attn b={b} S={S} fill={args.fill} kvh={kvh} g={groups} hd={hd}: "
        f"kernel {t_kernel * 1e6:.1f} us ({sol / t_kernel * 100:.0f}% SoL)  "
        f"xla {t_xla * 1e6:.1f} us  speedup {t_xla / t_kernel:.2f}x"
    )


if __name__ == "__main__":
    main()
