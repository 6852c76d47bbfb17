"""Kernel-level benchmark: quantized decode/prefill matmuls vs speed-of-light.

Usage: python benchmarks/bench_kernels.py [--prefill]

Prints per-shape device time, HBM speed-of-light (weight traffic at the
platform's bandwidth), and utilization for the w8a8 / w4a8 Pallas kernels
and the XLA bf16 baseline. Shapes are llama-7B projections (qkv fused,
gate-up fused, down, o) at decode (M=8) and prefill (M=2048) sizes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import quant_matmul as QM
from llm_qat_tpu.utils.benchmarking import dispatch_floor, measure

# v5e ~819 GB/s; good enough for utilization reporting on other parts too
HBM_BYTES_PER_S = 819e9

LLAMA7B_SHAPES = [
    ("qkv", 4096, 12288),
    ("gateup", 4096, 22016),
    ("down", 11008, 4096),
    ("o", 4096, 4096),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefill", action="store_true", help="M=2048 instead of 8")
    ap.add_argument("--iters", type=int, default=500)
    args = ap.parse_args()
    M = 2048 if args.prefill else 8

    key = jax.random.PRNGKey(0)
    floor = dispatch_floor(iters=args.iters)
    print(f"dispatch floor: {floor * 1e3:.2f} ms/call   M={M}")

    for name, K, N in LLAMA7B_SHAPES:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.float32)
        wq8, sw8 = QM.quantize_per_channel(w, 8)
        wq4, sw4 = QM.quantize_weights_w4(w)
        wbf = w.astype(jnp.bfloat16)
        xq, sx = QM.quantize_per_token(x)
        xq, _ = QM._pad_rows(xq, 32)
        sx, _ = QM._pad_rows(sx, 32)

        rows = [
            ("w8a8", lambda a, b, c, d: QM.int8_matmul(a, b, c, d), (xq, wq8, sx, sw8), K * N),
            ("w4a8", lambda a, b, c, d: QM.int4_matmul(a, b, c, d), (xq, wq4, sx, sw4), K * N // 2),
            ("bf16", lambda a, b: jnp.matmul(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), (x, wbf), K * N * 2),
        ]
        print(f"{name}: K={K} N={N}")
        for label, fn, a, wbytes in rows:
            t = measure(fn, a, iters=args.iters, floor=floor)
            sol = wbytes / HBM_BYTES_PER_S
            flops = 2 * M * K * N
            print(
                f"  {label}: {t * 1e6:8.1f} us   weight-SoL {sol * 1e6:7.1f} us"
                f"   util {sol / t * 100 if t else 0:5.1f}%   {flops / t / 1e12 if t else 0:6.1f} TF/s"
            )


if __name__ == "__main__":
    main()
