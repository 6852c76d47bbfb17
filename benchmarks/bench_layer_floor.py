"""Decompose the decode-step floor: per-layer matmuls vs the full layer.

Times (scan-harnessed, dispatch-floor-subtracted):
  * each of the four serving matmuls at decode shapes (M=batch),
  * their sum vs the measured full serving layer,
so the gap attributable to inter-op work (norms, act quant, KV quant,
cache writes, attention) is visible.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import quant_matmul as QM
from llm_qat_tpu.utils.benchmarking import dispatch_floor, measure

HBM = 819e9

TINYLLAMA = [
    ("qkv", 2048, 2560),
    ("o", 2048, 2048),
    ("gateup", 2048, 11264),
    ("down", 5632, 2048),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()
    M = args.m

    key = jax.random.PRNGKey(0)
    floor = dispatch_floor(iters=args.iters)
    print(f"dispatch floor: {floor * 1e6:.1f} us/call  M={M}")

    total = 0.0
    total_sol = 0.0
    for name, K, N in TINYLLAMA:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.float32)
        wq8, sw8 = QM.quantize_per_channel(w, 8)
        t = measure(
            lambda x, w, s: QM.w8a8_matmul(x, w, s),
            (x, wq8, sw8),
            iters=args.iters,
            floor=floor,
        )
        sol = K * N / HBM
        total += t
        total_sol += sol
        print(
            f"  {name:7s} K={K:5d} N={N:5d}: {t * 1e6:7.1f} us  "
            f"SoL {sol * 1e6:6.1f} us  ({sol / t * 100:4.0f}%)"
        )
    print(
        f"  sum of matmuls: {total * 1e6:.1f} us/layer  "
        f"(SoL {total_sol * 1e6:.1f} us, {total_sol / total * 100:.0f}%)"
    )


if __name__ == "__main__":
    main()
