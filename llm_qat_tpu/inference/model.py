"""Serving forward pass: true-int weights + int8 KV cache + ragged batch.

Mirrors the numerics of the training model (models/llama.py) exactly:
  * KV is quantized per-token pre-RoPE (modeling_llama_quant.py:320-333);
    the cache stores the *integer* K/V and per-token scales, and RoPE is
    applied after dequantization — algebraically identical to the training
    path's RoPE(fake_quant(k)) since RoPE is linear per 2-plane;
  * weight matmuls run on the int8/int4 MXU kernels
    (ops/pallas/quant_matmul.py) with per-channel scales;
  * fp32 softmax, RMSNorm, unquantized lm_head as in training.

Ragged continuous batching: every slot carries its own length; the decode
step is one jitted call over ``[B]`` tokens with per-slot positions and
masks, and prefill writes a single slot's pages via dynamic_update_slice.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.inference import quantized as Q

_NEG_INF = -1e9


def init_serving_cache(
    config: LlamaConfig, batch: int, max_len: int
) -> Dict[str, jax.Array]:
    """int8 KV cache + f32 per-token scales, stacked over layers."""
    c = config
    kv_dim = c.kv_heads * c.head_dim
    shape = (c.num_hidden_layers, batch, max_len, kv_dim)
    return {
        "k_q": jnp.zeros(shape, jnp.int8),
        "k_s": jnp.ones(shape[:-1] + (1,), jnp.float32),
        "v_q": jnp.zeros(shape, jnp.int8),
        "v_s": jnp.ones(shape[:-1] + (1,), jnp.float32),
        "lengths": jnp.zeros((batch,), jnp.int32),
    }


def _serving_layer(
    h: jax.Array,            # [b, s, H]
    lq: Dict[str, Any],      # quantized layer params
    config: LlamaConfig,
    positions: jax.Array,    # [b, s]
    kv_layer: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    write_pos: jax.Array,    # [b] write offset per slot
    kv_valid: jax.Array,     # [b, max_len] bool — which cache entries attend
    dtype,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    c = config
    b, s, _ = h.shape
    hd, nh, kvh = c.head_dim, c.num_attention_heads, c.kv_heads
    kb = c.kv_bits if c.kv_bits < 32 else 8  # cache is int8 storage

    k_q, k_s, v_q, v_s = kv_layer
    max_len = k_q.shape[1]

    x = llama.rms_norm(h, lq["attn_norm"], c.rms_norm_eps)
    qkv = Q.quant_linear(x, lq["qkv"], c.w_bits, out_dtype=dtype)
    q_dim, kv_dim = nh * hd, kvh * hd
    q = qkv[..., :q_dim]
    k = qkv[..., q_dim : q_dim + kv_dim]
    v = qkv[..., q_dim + kv_dim :]

    # quantize new K/V per-token pre-RoPE (training hook point) and write
    # each slot's rows at its own offset
    nk_q, nk_s = Q.quantize_kv(k, kb)
    nv_q, nv_s = Q.quantize_kv(v, kb)

    def write_row(cache, new, wp):
        return jax.lax.dynamic_update_slice(cache, new, (wp, 0))

    k_q = jax.vmap(write_row)(k_q, nk_q, write_pos)
    k_s = jax.vmap(write_row)(k_s, nk_s, write_pos)
    v_q = jax.vmap(write_row)(v_q, nv_q, write_pos)
    v_s = jax.vmap(write_row)(v_s, nv_s, write_pos)

    # dequantize the full cache, reshape to heads, RoPE with absolute positions
    kd = Q.dequantize_kv(k_q, k_s, dtype).reshape(b, max_len, kvh, hd)
    vd = Q.dequantize_kv(v_q, v_s, dtype).reshape(b, max_len, kvh, hd)
    cache_pos = jnp.broadcast_to(
        jnp.arange(max_len, dtype=jnp.int32), (b, max_len)
    )
    kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
    kd = llama.apply_rope(kd, kcos, ksin)

    qh = q.reshape(b, s, nh, hd)
    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    qh = llama.apply_rope(qh, qcos, qsin)

    # mask: cache position j visible to query row (b, i) iff j <= positions[b,i]
    # and j is a valid entry of the slot
    vis = (
        cache_pos[:, None, :] <= positions[:, :, None]
    ) & kv_valid[:, None, :]  # [b, s, max_len]
    mask = jnp.where(vis, 0.0, _NEG_INF)[:, None, :, :].astype(jnp.float32)

    attn = llama._attend(qh, kd, vd, mask)
    attn = Q.quant_linear(attn, lq["o"], c.w_bits, out_dtype=dtype)
    h = h + attn

    x = llama.rms_norm(h, lq["mlp_norm"], c.rms_norm_eps)
    gateup = Q.quant_linear(x, lq["gateup"], c.w_bits, out_dtype=dtype)
    gate, up = jnp.split(gateup, 2, axis=-1)
    x = Q.quant_linear(
        jax.nn.silu(gate) * up, lq["down"], c.w_bits, out_dtype=dtype
    )
    return h + x, (k_q, k_s, v_q, v_s)


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def serving_forward(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [b, s] — new tokens per slot (s=1 decode)
    seq_lens: jax.Array,     # [b] current length of each slot (pre-append)
    active: jax.Array,       # [b] bool — slots that should update
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run ``s`` new tokens for every slot at its own offset. Inactive slots
    compute but don't commit (their cache rows are written at a scratch
    position and lengths don't advance)."""
    c = config
    b, s = input_ids.shape
    max_len = cache["k_q"].shape[2]

    h = jnp.take(qparams["embed"], input_ids, axis=0).astype(dtype)
    positions = seq_lens[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    # inactive slots write into the last row (scratch) and never validate it
    write_pos = jnp.where(active, seq_lens, max_len - 1).astype(jnp.int32)
    new_len = jnp.where(active, seq_lens + s, seq_lens)
    kv_pos = jnp.arange(max_len, dtype=jnp.int32)
    kv_valid = kv_pos[None, :] < new_len[:, None]

    def body(h, xs):
        lq, k_q, k_s, v_q, v_s = xs
        out, new_kv = _serving_layer(
            h, lq, c, positions, (k_q, k_s, v_q, v_s), write_pos, kv_valid,
            dtype,
        )
        return out, new_kv

    layer_xs = (
        qparams["layers"],
        cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
    )
    h, (k_q, k_s, v_q, v_s) = jax.lax.scan(body, h, layer_xs)

    h = llama.rms_norm(h, qparams["final_norm"], c.rms_norm_eps)
    head = (
        qparams["embed"].T if "lm_head" not in qparams else qparams["lm_head"]
    )
    logits = jnp.matmul(
        h, head.astype(h.dtype), preferred_element_type=jnp.float32
    )
    new_cache = {
        "k_q": k_q, "k_s": k_s, "v_q": v_q, "v_s": v_s, "lengths": new_len,
    }
    return logits, new_cache
