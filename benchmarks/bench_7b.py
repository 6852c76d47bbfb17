"""Reference-scale serving perf: LLaMA-7B/13B shapes on one chip.

VERDICT r4 next #1: every perf number before round 5 was TinyLlama-1.1B,
while the reference's entire results table is LLaMA-7B (README.md:45-54,
run_train.sh:8). This bench measures the true-int serving path at the
reference's model geometry — decode ms/step vs the weight+KV HBM floor and
prefill tokens/s — on the one real chip.

Weights are synthesized directly in the quantized serving layout (random
int4/int8 + fixed scales): random-init is fine for perf, and synthesizing
the int containers sidesteps the latent-fp OOM (7B bf16 = 13.5 GB next to
its int copy on a 16 GB part — quantized.quantize_params_host exists for
real checkpoints; perf doesn't need one).

Usage (always under `timeout`, one TPU process at a time):
  python benchmarks/bench_7b.py --model 7b --w 4 --kv 4            # decode
  python benchmarks/bench_7b.py --model 7b --w 8 --kv 8            # scan path
  python benchmarks/bench_7b.py --model 7b --w 4 --kv 4 --prefill  # +prefill
"""

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
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

HBM_GBPS = 819e9  # v5e


@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def _rand_bits(key, shape, dtype):
    """Random bytes reinterpreted as the container dtype (full range).

    Generated per leading-dim slice under lax.map: threefry's temps run
    ~2-3x the output size, and a one-shot 2.9 GB gateup tensor's ~8 GB
    generation spike OOMs next to the already-resident weights. The map
    bounds transients to one slice (~90 MB at 7B)."""
    import math

    per = math.prod(shape[1:])
    assert per % 4 == 0, shape

    def gen(k):
        u32 = jax.random.bits(k, (per // 4,), dtype=jnp.uint32)
        return jax.lax.bitcast_convert_type(u32, jnp.uint8).reshape(shape[1:])

    u8 = jax.lax.map(gen, jax.random.split(key, shape[0]))
    if dtype == jnp.uint8:
        return u8
    return jax.lax.bitcast_convert_type(u8, jnp.int8)


def synth_qparams(cfg, key, dtype=jnp.bfloat16):
    """Build the quantized serving pytree (quantized.quantize_params's
    output layout) directly: int containers random, scales fixed so
    dequantized weights sit in ~[-1, 1] and activations stay finite."""
    c = cfg
    H, I, L, V = c.hidden_size, c.intermediate_size, c.num_hidden_layers, c.vocab_size
    kv_dim = c.kv_heads * c.head_dim
    Dq = H + 2 * kv_dim
    w4 = c.w_bits == 4
    wdt = jnp.uint8 if w4 else jnp.int8
    kdiv = 2 if w4 else 1
    smax = 7.0 if w4 else 127.0
    ks = jax.random.split(key, 8)

    def wq(k, K, N):
        return {
            "q": _rand_bits(k, (L, K // kdiv, N), wdt),
            "s": jnp.full((L, 1, N), smax, jnp.float32),
        }

    return {
        "embed": (jax.random.normal(ks[0], (V, H), dtype) * 0.02),
        "lm_head": (jax.random.normal(ks[1], (H, V), dtype) * 0.02),
        "final_norm": jnp.ones((H,), dtype),
        "layers": {
            "attn_norm": jnp.ones((L, H), dtype),
            "mlp_norm": jnp.ones((L, H), dtype),
            "qkv": wq(ks[2], H, Dq),
            "o": wq(ks[3], H, H),
            "gateup": wq(ks[4], H, 2 * I),
            "down": wq(ks[5], I, H),
        },
    }


def synth_cache(cfg, b, ctx, fill, key):
    """Zero-int cache with ``fill`` valid tokens per slot. Decode perf is
    value-independent (the kernel streams the same bytes and the softmax
    over zero scores is finite); generating GBs of random ints costs a 2x
    temp that pushes 7B-KV8 past the 16 GB part."""
    from llm_qat_tpu.inference import model as M

    del key
    cache = M.init_serving_cache(cfg, b, ctx)
    return dict(cache, lengths=jnp.full((b,), fill, jnp.int32))


def decode_floor_bytes(cfg, b, fill):
    c = cfg
    H, I, L, V = c.hidden_size, c.intermediate_size, c.num_hidden_layers, c.vocab_size
    kv_dim = c.kv_heads * c.head_dim
    wb_layer = H * (H + 2 * kv_dim) + H * H + 2 * H * I + I * H
    wper = 0.5 if c.w_bits == 4 else 1.0
    wbytes = L * wb_layer * wper + V * H * 2  # + bf16 lm_head
    kvper = 0.5 if (c.kv_cache_pack and c.kv_bits <= 4) else 1.0
    kvbytes = L * b * fill * 2 * kv_dim * kvper
    return wbytes + kvbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "13b"])
    ap.add_argument("--w", type=int, default=4, choices=[4, 8])
    ap.add_argument("--kv", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--fill", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no_megakernel", action="store_true")
    ap.add_argument("--no_decode", action="store_true")
    ap.add_argument("--prefill", action="store_true")
    ap.add_argument("--prefill_batch", type=int, default=4)
    ap.add_argument("--prefill_seq", type=int, default=2048)
    ap.add_argument("--nc", type=int, default=0)
    ap.add_argument("--bk", type=int, default=0)
    args = ap.parse_args()

    from llm_qat_tpu.inference import model as M
    from llm_qat_tpu.inference import megakernel as MK
    from llm_qat_tpu.models.config import LLAMA_7B, LLAMA_13B
    from llm_qat_tpu.utils.profiling import chip_peak_flops, model_flops_per_token

    base = {"7b": LLAMA_7B, "13b": LLAMA_13B}[args.model]
    cfg = base.replace(
        w_bits=args.w, a_bits=8, kv_bits=args.kv,
        use_megakernel=not args.no_megakernel,
        megakernel_nc=args.nc, megakernel_bk=args.bk,
        max_position_embeddings=args.ctx,
    )
    b, ctx, fill = args.batch, args.ctx, args.fill
    on_tpu = jax.devices()[0].platform == "tpu"
    mk = (not args.no_megakernel) and MK.supported(cfg, b, ctx)
    print(f"# {args.model} W{args.w}A8KV{args.kv} b={b} ctx={ctx} fill={fill} "
          f"megakernel={'on' if mk else 'off(scan)'} "
          f"nc_bk={MK._pick_nc_bk(cfg, b, ctx)}", flush=True)

    qparams = synth_qparams(cfg, jax.random.PRNGKey(0))

    if not args.no_decode:
        cache = synth_cache(cfg, b, ctx, fill, jax.random.PRNGKey(1))
        active = jnp.ones((b,), bool)
        tok0 = jnp.ones((b, 1), jnp.int32)
        d_iters = args.iters

        # One jit per STEP with a donated cache, driven by a host loop of
        # async dispatches: a lax.scan carry would double-buffer the cache
        # (4.3 GB at KV8 b=8) next to 6.9 GB of weights — OOM. Async
        # dispatch pipelines over the tunnel, so per-call RTT is hidden
        # behind the ~10-40 ms 7B device step (unlike the sync-readback
        # microbench case the TinyLlama bench's in-jit scan guards against).
        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(qp, cache, tok):
            logits, cache = M.serving_forward(
                qp, cfg, tok, cache["lengths"], active, cache
            )
            tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return tok, cache

        t0 = time.perf_counter()
        tok, cache = step(qparams, cache, tok0)
        float(tok.sum())
        print(f"# decode compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.reps * d_iters):
            tok, cache = step(qparams, cache, tok)
        float(tok.sum())
        t_dec = (time.perf_counter() - t0) / (args.reps * d_iters)

        sol = decode_floor_bytes(cfg, b, fill) / HBM_GBPS if on_tpu else None
        print(json.dumps({
            "metric": f"llama{args.model}_w{args.w}a8kv{args.kv}_decode_ms_per_step",
            "value": round(t_dec * 1e3, 3),
            "unit": "ms/step",
            "vs_baseline": round(sol / t_dec, 4) if sol else None,
            "tok_per_s": round(b / t_dec, 1),
            "batch": b, "ctx_fill": fill,
            "path": "megakernel" if mk else "scan",
        }), flush=True)
        del cache

    if args.prefill:
        pb, ps = args.prefill_batch, args.prefill_seq
        pcache = M.init_serving_cache(cfg, pb, ctx)
        pactive = jnp.ones((pb,), bool)
        ids = jax.random.randint(jax.random.PRNGKey(2), (pb, ps), 0, cfg.vocab_size)

        @jax.jit
        def prefill(qp, cache, ids):
            logits, cache = M.serving_forward(
                qp, cfg, ids, cache["lengths"], pactive, cache, from_empty=True
            )
            return logits[:, -1].sum()

        t0 = time.perf_counter()
        float(prefill(qparams, pcache, ids))
        print(f"# prefill compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        reps = args.reps
        for _ in range(reps):
            float(prefill(qparams, pcache, ids))
        t_pf = (time.perf_counter() - t0) / reps
        tok_s = pb * ps / t_pf
        peak = chip_peak_flops(int8=True) if on_tpu else None
        print(json.dumps({
            "metric": f"llama{args.model}_w{args.w}a8kv{args.kv}_prefill_throughput",
            "value": round(tok_s, 1),
            "unit": "tokens/s/chip",
            "vs_baseline": None,
            "mfu_int8": round(tok_s * model_flops_per_token(cfg, ps) / peak, 4)
            if peak else None,
            "batch": pb, "seq": ps,
        }), flush=True)


if __name__ == "__main__":
    main()
