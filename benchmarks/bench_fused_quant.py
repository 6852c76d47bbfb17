"""A/B the producer-fused act-quant kernels against the XLA composition.

Standalone kernel timings at the prefill hot shapes, plus the full
TinyLlama QAT prefill step with config.fused_norm_quant on/off — the
isolation bench for VERDICT r4 next #2.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B
from llm_qat_tpu.ops.pallas import fused_quant
from llm_qat_tpu.ops.pallas.qat_matmul import _quant_int

HBM = 819e9
ITER = 32


def scan_time(op, *args, iters=ITER, reps=3):
    @jax.jit
    def run(*args):
        def body(c, _):
            y = op(args[0] + c.astype(args[0].dtype) * 1e-30, *args[1:])
            feed = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(y))
            return c + feed * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    float(run(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(*args))
    return (time.perf_counter() - t0) / reps / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run full-step A/B")
    args = ap.parse_args()

    M, H, I = 8192, 2048, 5632
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (M, H), jnp.bfloat16)
    g = jnp.ones((H,), jnp.float32)
    gate = jax.random.normal(key, (M, I), jnp.bfloat16)
    up = jax.random.normal(key, (M, I), jnp.bfloat16)

    def xla_norm_quant(h, g):
        xn = llama.rms_norm(h, g, 1e-6)
        return _quant_int(xn, 8, axis=-1)

    def xla_silu_quant(gate, up):
        return _quant_int(jax.nn.silu(gate) * up, 8, axis=-1)

    rows = [
        ("rmsnorm+quant XLA", lambda: scan_time(xla_norm_quant, h, g), 3 * M * H),
        ("rmsnorm+quant pallas", lambda: scan_time(
            lambda h, g: fused_quant.rmsnorm_quant(h, g, 1e-6, 8), h, g), 3 * M * H),
        ("silu*up+quant XLA", lambda: scan_time(xla_silu_quant, gate, up), 5 * M * I),
        ("silu*up+quant pallas", lambda: scan_time(
            lambda a, b: fused_quant.silu_mul_quant(a, b, 8), gate, up), 5 * M * I),
    ]
    for name, fn, bytes_ in rows:
        t = fn()
        print(f"{name:24s} {t * 1e6:8.1f} us   floor {bytes_ / HBM * 1e6:6.1f} us "
              f"({bytes_ / HBM / t * 100:5.1f}% of BW)")

    if args.full:
        for fused in (False, True):
            cfg = TINYLLAMA_1B.replace(
                w_bits=8, a_bits=8, kv_bits=16, fused_norm_quant=fused,
            )
            params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
            ids = jax.random.randint(jax.random.PRNGKey(1), (4, 2048), 0, cfg.vocab_size)
            f = jax.jit(lambda p, i: llama.forward(p, cfg, i, dtype=jnp.bfloat16).mean())
            float(f(params, ids))
            t0 = time.perf_counter()
            for _ in range(9):
                f(params, ids)
            float(f(params, ids))
            t = (time.perf_counter() - t0) / 10
            print(f"full prefill fused_norm_quant={fused}: {t * 1e3:.2f} ms "
                  f"({4 * 2048 / t:,.0f} tok/s)")


if __name__ == "__main__":
    main()
