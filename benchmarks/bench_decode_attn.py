"""Microbench: fused int8-KV decode attention kernel vs the XLA path.

Times just the attention op (per layer) at serving shapes, with the scan
harness. The XLA comparator mirrors inference/model.py's fallback: dequant
the whole head-major cache, RoPE, full-matrix softmax.

Caveat on the XLA number: in this harness only q varies per iteration, so
XLA hoists the (q-independent) cache dequant+RoPE out of the timing scan —
the printed XLA time measures the attention matmuls alone. In real serving
the cache changes every step and the XLA path pays the full ~5 B/elem
dequant traffic (~80 us at these shapes on v5e); the kernel number is the
honest one.
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
    k_t = jnp.swapaxes(k_q, 2, 3).copy()     # kernel layout [b, kvh, hd, S]
    v_q = jax.random.randint(key, (b, kvh, S, hd), -127, 128, jnp.int8)
    v_t = jnp.swapaxes(v_q, 2, 3).copy()     # V shares K's layout (round 4)
    k_s = jax.random.uniform(key, (b, S), jnp.float32, 0.005, 0.02)
    v_s = jax.random.uniform(key, (b, S), jnp.float32, 0.005, 0.02)
    lengths = jnp.full((b,), args.fill, jnp.int32)
    # hoisted RoPE tables, [hd/2, S] (what inference/model.py passes)
    pos = jnp.arange(S, dtype=jnp.float32)
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, jnp.float32) / hd))
    fr = inv_freq[:, None] * pos[None, :]
    kc, ksn = jnp.cos(fr), jnp.sin(fr)

    floor = dispatch_floor(iters=args.iters)
    t_kernel = measure(
        lambda q, kq, ks, vq, vs: DA.quantized_decode_attention(
            q, kq, ks, vq, vs, lengths, kc, ksn, bk=args.bk
        ),
        (q, k_t, k_s, v_t, v_s),
        iters=args.iters,
        floor=floor,
    )
    t_post = measure(
        lambda q, kq, ks, vq, vs: DA.quantized_decode_attention(
            q, kq, ks, vq, vs, lengths, bk=args.bk, rope=False
        ),
        (q, k_t, k_s, v_t, v_s),
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

    def pct(t):  # floor subtraction can clip a sub-floor op to ~0
        return f"{sol / t * 100:.0f}% SoL" if t > 1e-9 else "~floor"

    print(
        f"decode attn b={b} S={S} fill={args.fill} kvh={kvh} g={groups} hd={hd}: "
        f"kernel {t_kernel * 1e6:.1f} us ({pct(t_kernel)})  "
        f"post-rope {t_post * 1e6:.1f} us ({pct(t_post)})  "
        f"xla {t_xla * 1e6:.1f} us  speedup {t_xla / max(t_kernel, 1e-9):.2f}x"
    )


if __name__ == "__main__":
    main()
