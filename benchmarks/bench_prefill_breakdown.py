"""Prefill speed-of-light study (VERDICT r3 item 4).

Decomposes the driver's headline prefill metric — TinyLlama-1.1B-shaped
W8A8KV16 QAT forward at b=4 s=2048 (bench.py) — into its component costs,
each measured standalone at the exact hot-path shapes.

Measurement discipline for the tunneled axon chip: per-dispatch RTT is
milliseconds, so every component runs ITER chained iterations inside ONE
jitted ``lax.scan`` (a 1e-30-scaled feedback into the carry defeats
hoisting without changing the math) and the single dispatch is synced by
scalar readback. The full step gets the same treatment.

Prints a table plus the mixed-precision compute ceiling: projections ride
the int8 MXU (394 TOPS v5e), attention/head ride bf16 (197 TFLOPs), so
the achievable floor is sum(component flops / its peak). MFU relative to
that mixed ceiling says how far the implementation is from ITS OWN speed
of light rather than from a single-dtype peak.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINYLLAMA_1B
from llm_qat_tpu.ops.pallas.qat_matmul import fused_quant_matmul, _quant_int
from llm_qat_tpu.ops.pallas.flash_attention import flash_attention

INT8_PEAK = 394e12  # v5e
BF16_PEAK = 197e12
HBM = 819e9
ITER = 16


def scan_time(op, x, *rest, iters=ITER, reps=3):
    """One dispatch of ``iters`` chained ``op(x, *rest)`` evaluations."""

    @jax.jit
    def run(x, *rest):
        def body(c, _):
            y = op(c, *rest)
            # full-reduction feedback: chains iterations AND blocks XLA
            # from narrowing the op to a sliced consumer (a [..., :1]
            # slice would let the compiler shrink a matmul to one column)
            feed = jnp.sum(y).astype(c.dtype) * 1e-30
            return c + feed, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c[..., :1])

    float(run(x, *rest))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(x, *rest))
    return (time.perf_counter() - t0) / reps / iters


def main():
    cfg = TINYLLAMA_1B.replace(
        w_bits=8, a_bits=8, kv_bits=16,
        use_flash_attention=True, fused_qat_matmul=True,
    )
    b, s = 4, 2048
    c = cfg
    H, I, L, V = c.hidden_size, c.intermediate_size, c.num_hidden_layers, c.vocab_size
    nh, kvh, hd = c.num_attention_heads, c.kv_heads, c.head_dim
    Dq = H + 2 * kvh * hd
    M = b * s

    key = jax.random.PRNGKey(0)
    params = llama.init_params(cfg, key, dtype=jnp.bfloat16)
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, s), 0, V)

    # ---- full step (the bench.py metric), same one-dispatch treatment --
    @jax.jit
    def full(p, i):
        def body(carry, _):
            out = llama.forward(p, cfg, i, dtype=jnp.bfloat16)
            return carry + out.mean() * 1e-30, ()

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=4)
        return acc

    float(full(params, ids))
    t0 = time.perf_counter()
    float(full(params, ids))
    t_full = (time.perf_counter() - t0) / 4

    # ---- the 4 projections at hot shapes, x22 ---------------------------
    shapes = {"qkv": (H, Dq), "o": (H, H), "gateup": (H, 2 * I), "down": (I, H)}
    t_proj, fl_proj = {}, {}
    for name, (K, N) in shapes.items():
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        t = scan_time(lambda x, w: fused_quant_matmul(x, w, 8, 8), x, w)
        t_proj[name] = t * L
        fl_proj[name] = 2 * M * K * N * L
    proj_t = sum(t_proj.values())
    proj_fl = sum(fl_proj.values())

    # ---- dynamic weight re-quant alone (absmax+round, all 4 weights) ----
    ws = [jax.random.normal(jax.random.PRNGKey(i), (K, N), jnp.bfloat16)
          for i, (K, N) in enumerate(shapes.values())]

    def wq_op(w0, w1, w2, w3):
        out = jnp.zeros((1, 1), jnp.float32)
        for w in (w0, w1, w2, w3):
            q, sc = _quant_int(w, 8, 0)
            out = out + jnp.sum(q.astype(jnp.int32)) + jnp.sum(sc)
        return out

    t_wq = scan_time(wq_op, *ws) * L
    wbytes = sum(K * N for (K, N) in shapes.values()) * 2 * L

    # ---- flash attention x22 --------------------------------------------
    q = jax.random.normal(key, (b, s, nh, hd), jnp.bfloat16)
    kv = jax.random.normal(key, (b, s, kvh, hd), jnp.bfloat16)
    t_fa = scan_time(lambda q, k, v: flash_attention(q, k, v), q, kv, kv) * L
    fl_fa = 2 * 2 * b * nh * hd * (s * (s + 1) / 2) * L  # causal QK^T + PV

    # ---- lm_head --------------------------------------------------------
    hsty = jax.random.normal(key, (b, s, H), jnp.bfloat16)
    head = jax.random.normal(key, (H, V), jnp.bfloat16)
    t_head = scan_time(
        lambda h, w: jnp.matmul(h, w, preferred_element_type=jnp.float32),
        hsty, head,
    )
    fl_head = 2 * M * H * V

    # ---- report ---------------------------------------------------------
    rest = t_full - proj_t - t_fa - t_head
    tok_s = M / t_full

    def row(name, t, fl=None, peak=None):
        pct = 100 * t / t_full
        eff = f"  {fl / t / peak * 100:5.1f}% of peak" if fl else ""
        print(f"  {name:24s} {t * 1e3:8.2f} ms  {pct:5.1f}%{eff}")

    print(f"prefill b={b} s={s} W8A8KV16 QAT fwd: {t_full * 1e3:.2f} ms "
          f"({tok_s:,.0f} tok/s)")
    for name in shapes:
        row(f"proj {name} x{L}", t_proj[name], fl_proj[name], INT8_PEAK)
    row(f"weight requant x{L}", t_wq)
    print(f"      (weight requant streams {wbytes / 1e9:.2f} GB bf16 -> "
          f"HBM floor {wbytes / HBM * 1e3:.2f} ms; included in proj rows)")
    row(f"flash attention x{L}", t_fa, fl_fa, BF16_PEAK)
    row("lm_head bf16", t_head, fl_head, BF16_PEAK)
    row("rest (norm/rope/embed)", rest)

    ceiling = proj_fl / INT8_PEAK + fl_fa / BF16_PEAK + fl_head / BF16_PEAK
    print(f"  mixed compute ceiling    {ceiling * 1e3:8.2f} ms "
          f"({M / ceiling:,.0f} tok/s) -> step at "
          f"{100 * ceiling / t_full:.1f}% of mixed ceiling")


if __name__ == "__main__":
    main()
