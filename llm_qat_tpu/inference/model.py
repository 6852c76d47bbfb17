"""Serving forward pass: true-int weights + int8 KV cache + ragged batch.

Mirrors the numerics of the training model (models/llama.py) exactly:
  * KV is quantized per-token pre-RoPE (modeling_llama_quant.py:320-333);
    the cache stores the *integer* K/V and per-token inverse scales, and
    RoPE is applied after dequantization — algebraically identical to the
    training path's RoPE(fake_quant(k)) since RoPE is linear per 2-plane;
  * weight matmuls run on the int8/int4 MXU kernels
    (ops/pallas/quant_matmul.py) with per-channel scales;
  * fp32 softmax, RMSNorm, unquantized lm_head as in training.

Cache layout: BOTH K and V are stored transposed — ``[L, b, kvh, hd, S]``
int8 + per-token f32 inverse scales ``[L, b, S]`` — so the fused
decode-attention kernels (ops/pallas/decode_attention.py) and the
whole-model megakernel (inference/megakernel.py) stream length-axis column
chunks with plain DMA slices: dequant, RoPE, and online softmax never
leave VMEM, and no path pays an XLA relayout copy of the cache.
Prefill (s>1) uses the XLA path over the same cache.

Ragged continuous batching: every slot carries its own length; the decode
step is one jitted call over ``[B]`` tokens with per-slot positions and
masks, and prefill writes a single slot's rows via dynamic_update_slice.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.ops.pallas import decode_attention as DA

_NEG_INF = -1e9


def init_serving_cache(
    config: LlamaConfig, batch: int, max_len: int
) -> Dict[str, jax.Array]:
    """Head-major int8 KV cache + f32 per-token inverse scales, stacked
    over layers. K AND V are stored transposed — ``[L, b, kvh, hd, S]`` —
    so the decode kernels stream length-axis column chunks directly
    (ops/pallas/decode_attention.py layout notes)."""
    # the decode kernel tiles the length axis in multiples of 8 lanes
    # (ops/pallas/decode_attention._pick_bk); an unaligned cache would read
    # uninitialized tail rows and NaN the softmax — fail loudly instead
    # (prefill-only temp caches use _empty_cache and may be unaligned)
    if max_len % 8:
        raise ValueError(f"serving cache max_len must be a multiple of 8, got {max_len}")
    return _empty_cache(config, batch, max_len)


def cache_is_packed(config: LlamaConfig) -> bool:
    """KV4 nibble packing applies to the contiguous cache
    (config.kv_cache_pack): storage is [.., hd/2, S] uint8 for both K and
    V, with the hd halves split-half packed per byte."""
    return bool(config.kv_cache_pack) and config.kv_bits <= 4


def _pack_nibbles(q: jax.Array, axis: int = -1) -> jax.Array:
    """int8 in [-8, 7] -> uint8, split-half packed along ``axis`` (low half
    of the axis rides the low nibble — quant_matmul.pack_int4's scheme)."""
    h2 = q.shape[axis] // 2
    lo = jax.lax.slice_in_dim(q, 0, h2, axis=axis).astype(jnp.uint8) & 0xF
    hi = jax.lax.slice_in_dim(q, h2, 2 * h2, axis=axis).astype(jnp.uint8) & 0xF
    return (hi << 4 | lo).astype(jnp.uint8)


def _unpack_nibbles(p: jax.Array, axis: int = -1) -> jax.Array:
    """Inverse of _pack_nibbles -> int8 (sign-extended nibbles)."""
    pi = p.astype(jnp.int32)
    lo = ((pi << 28) >> 28).astype(jnp.int8)
    hi = ((pi << 24) >> 28).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=axis)


def _empty_cache(
    config: LlamaConfig, batch: int, max_len: int
) -> Dict[str, jax.Array]:
    c = config
    hd = c.head_dim // 2 if cache_is_packed(c) else c.head_dim
    qdt = jnp.uint8 if cache_is_packed(c) else jnp.int8
    kshape = (c.num_hidden_layers, batch, c.kv_heads, hd, max_len)
    vshape = kshape                  # V shares K's transposed layout
    sshape = (c.num_hidden_layers, batch, max_len)
    return {
        "k_q": jnp.zeros(kshape, qdt),
        "k_s": jnp.ones(sshape, jnp.float32),
        "v_q": jnp.zeros(vshape, qdt),
        "v_s": jnp.ones(sshape, jnp.float32),
        "lengths": jnp.zeros((batch,), jnp.int32),
    }


def _write_kv(cache_q, cache_s, new, write_pos, kvh, hd, kv_bits,
              tp_axis=None, transposed=False, return_fq=False,
              packed=False):
    """Quantize ``new`` [b, s, kvh*hd] per-token and write each slot's rows
    at its own offset into head-major (cache_q [b, kvh, S, hd] — or
    [b, kvh, hd, S] when ``transposed``, the layout both K and V use since
    round 4 — and cache_s [b, S]). Under tensor parallelism ``new`` holds the local head shard;
    the per-token scale is computed from the pmax over shards so the
    sharded cache holds exactly the single-device integers.

    ``return_fq`` additionally returns the fake-quant (int·inv_scale) value
    of ``new`` as ``[b, s, kvh, hd]`` f32 — bit-identical to reading the
    just-written rows back out of the cache, without touching it."""
    b, s, _ = new.shape
    amax = None
    if tp_axis is not None:
        amax = jax.lax.pmax(
            jnp.max(jnp.abs(new), axis=-1, keepdims=True), tp_axis
        )
    nq, ns = Q.quantize_kv(new, kv_bits, amax=amax)  # int8 [b,s,kv], s [b,s,1]
    inv = (1.0 / (ns + 1e-6))[..., 0]             # [b, s] inverse scales
    fq = None
    if return_fq:
        fq = (nq.astype(jnp.float32) * inv[..., None]).reshape(b, s, kvh, hd)
    nq = nq.reshape(b, s, kvh, hd)
    if packed:
        nq = _pack_nibbles(nq, axis=-1)        # [b, s, kvh, hd/2] uint8
    if transposed:
        nq = nq.transpose(0, 2, 3, 1)          # [b, kvh, hd(/2), s]
    else:
        nq = nq.transpose(0, 2, 1, 3)          # [b, kvh, s, hd(/2)]

    def write_row(cq, cs, q_new, s_new, wp):
        if transposed:
            cq = jax.lax.dynamic_update_slice(cq, q_new, (0, 0, wp))
        else:
            cq = jax.lax.dynamic_update_slice(cq, q_new, (0, wp, 0))
        cs = jax.lax.dynamic_update_slice(cs, s_new, (wp,))
        return cq, cs

    cache_q, cache_s = jax.vmap(write_row)(cache_q, cache_s, nq, inv,
                                           write_pos)
    if return_fq:
        return cache_q, cache_s, fq
    return cache_q, cache_s


def _quant_kv_cols(new, kvh, hd, kv_bits, tp_axis=None):
    """Quantize one decode step's K or V per-token WITHOUT touching the
    cache: ``new`` [b, 1, kvh*hd] -> (int8 columns [b, kvh, hd], inverse
    scales [b, 1]). Same numerics as `_write_kv` (the committed integers
    are bit-identical); under TP the scale uses the global absmax."""
    b = new.shape[0]
    amax = None
    if tp_axis is not None:
        amax = jax.lax.pmax(
            jnp.max(jnp.abs(new), axis=-1, keepdims=True), tp_axis
        )
    nq, ns = Q.quantize_kv(new, kv_bits, amax=amax)  # [b,1,kv], [b,1,1]
    inv = (1.0 / (ns + 1e-6))[:, 0]                  # [b, 1]
    return nq[:, 0].reshape(b, kvh, hd), inv


def commit_kv_columns(k_q, k_s, v_q, v_s, k_cols, v_cols, k_invs, v_invs,
                      write_pos, packed):
    """Write one quantized K/V column per (layer, slot) into the stacked
    transposed cache — the single small write a decode step makes now that
    attention folds the current pair in-kernel (the scan path used to
    rewrite the ENTIRE cache through the layer scan's ys every step: 2x
    the cache HBM traffic and an extra full-cache buffer, which OOM'd 7B
    KV8 serving on one chip — round 5).

    k_cols/v_cols [L, b, kvh, hd] int8; k_invs/v_invs [L, b, 1] f32;
    write_pos [b] (inactive slots point at the scratch row S-1)."""
    L, b, kvh, hd = k_cols.shape
    kq_cols = k_cols.reshape(L, b, kvh, hd, 1)
    vq_cols = v_cols.reshape(L, b, kvh, hd, 1)
    if packed:
        kq_cols = _pack_nibbles(kq_cols, axis=3)     # [L, b, kvh, hd/2, 1]
        vq_cols = _pack_nibbles(vq_cols, axis=3)

    def upd_k(cq, col, wp):
        return jax.lax.dynamic_update_slice(cq, col, (0, 0, 0, wp))

    def upd_s(cs, val, wp):
        return jax.lax.dynamic_update_slice(cs, val, (0, wp))

    k_q2 = jax.vmap(upd_k, in_axes=(1, 1, 0), out_axes=1)(k_q, kq_cols, write_pos)
    v_q2 = jax.vmap(upd_k, in_axes=(1, 1, 0), out_axes=1)(v_q, vq_cols, write_pos)
    k_s2 = jax.vmap(upd_s, in_axes=(1, 1, 0), out_axes=1)(k_s, k_invs, write_pos)
    v_s2 = jax.vmap(upd_s, in_axes=(1, 1, 0), out_axes=1)(v_s, v_invs, write_pos)
    return k_q2, k_s2, v_q2, v_s2


def _dequant_transposed(cq, cs, dtype, packed=False):
    """[b, kvh, hd(/2), S] int (transposed K) + [b, S] -> [b, S, kvh, hd]."""
    if packed:
        cq = _unpack_nibbles(cq, axis=-2)
    d = cq.astype(jnp.float32) * cs[:, None, None, :]
    return d.transpose(0, 3, 1, 2).astype(dtype)


def _serving_layer(
    h: jax.Array,            # [b, s, H]
    lq: Dict[str, Any],      # quantized layer params
    config: LlamaConfig,
    positions: jax.Array,    # [b, s]
    kv_layer: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    write_pos: jax.Array,    # [b] write offset per slot
    new_len: jax.Array,      # [b] valid length after this step's write
    dtype,
    tp_axis=None,
    rope_tables=None,        # (cos, sin) [max_len, hd/2] hoisted for decode
    from_empty=False,        # static: active slots prefill at seq_len 0
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array, jax.Array, jax.Array]]:
    c = config
    b, s, _ = h.shape
    hd = c.head_dim
    kb = min(c.kv_bits, 8)  # cache storage is int8: >=8-bit configs quantize at 8
    # flash prefill: when the caller guarantees active slots start at
    # length 0 (engine _admit resets the slot), the only visible cache rows
    # are this call's own fresh K/V — attend to the fake-quant values
    # directly with the causal flash kernel instead of dequantizing the
    # whole max_len cache per layer (O(s²) vs O(s·max_len) + full dequant)
    flash_prefill = (
        from_empty and s > 1 and c.use_prefill_flash
        and s % min(128, s) == 0
    )

    k_q, k_s, v_q, v_s = kv_layer
    max_len = k_q.shape[-1]
    # KV4 nibble packing composes with TP since round 4: packing is
    # per-head (split-half along hd), so the shard-local pack of local
    # heads equals the global pack sliced by head
    packed = cache_is_packed(c)
    # local head counts come from the (possibly tp-sharded) cache / fused
    # projection shapes; with tp_axis=None these equal the config's counts
    kvh = k_q.shape[1]

    x = llama.rms_norm(h, lq["attn_norm"], c.rms_norm_eps)
    qkv = Q.quant_linear(x, lq["qkv"], c.w_bits, a_bits=c.a_bits, out_dtype=dtype)
    kv_dim = kvh * hd
    q_dim = qkv.shape[-1] - 2 * kv_dim
    nh = q_dim // hd
    q = qkv[..., :q_dim]
    k = qkv[..., q_dim : q_dim + kv_dim]
    v = qkv[..., q_dim + kv_dim :]

    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    post_rope = c.kv_cache_rope == "post"
    if post_rope:
        # post-RoPE cache: rotate K at its absolute position BEFORE
        # quantizing, so reads never re-apply RoPE (config.kv_cache_rope)
        kh = llama.apply_rope(k.reshape(b, s, kvh, hd), qcos, qsin)
        k = kh.reshape(b, s, kvh * hd)

    fold_decode = s == 1 and c.use_decode_kernel and not flash_prefill
    if fold_decode:
        # decode: quantize the current K/V but DON'T write — the kernel
        # folds the pair in-kernel and the caller commits all layers'
        # columns post-scan (one small write per step instead of a full
        # cache rewrite through the scan's ys)
        k_cols, k_inv = _quant_kv_cols(k, kvh, hd, kb, tp_axis)
        v_cols, v_inv = _quant_kv_cols(v, kvh, hd, kb, tp_axis)
    else:
        # quantize new K/V per-token and write ("pre" = training hook
        # point, pre-RoPE integers, modeling_llama_quant.py:320-333);
        # both transposed
        k_q, k_s, fq_k = _write_kv(
            k_q, k_s, k, write_pos, kvh, hd, kb, tp_axis,
            transposed=True, return_fq=True, packed=packed,
        )
        v_q, v_s, fq_v = _write_kv(
            v_q, v_s, v, write_pos, kvh, hd, kb, tp_axis,
            transposed=True, return_fq=True, packed=packed,
        )

    qh = q.reshape(b, s, nh, hd)
    qh = llama.apply_rope(qh, qcos, qsin)

    if flash_prefill:
        from llm_qat_tpu.ops.pallas.flash_attention import flash_attention

        # fake-quant K/V of this call (== dequantized just-written rows);
        # "pre" mode rotates K after dequant, "post" quantized rotated K
        kf = fq_k.astype(dtype)
        vf = fq_v.astype(dtype)
        if not post_rope:
            kf = llama.apply_rope(kf, qcos, qsin)
        attn = flash_attention(qh.astype(dtype), kf, vf)
    elif fold_decode:
        # fused decode kernel: int8 cache blocks stream to VMEM; dequant +
        # K-RoPE + online softmax in-kernel; per-slot early exit at length.
        # The cache is READ-ONLY here — the current pair rides `fold` and
        # lengths are the PRE-append lengths (new_len-1 for active slots)
        kc, ksn = rope_tables if rope_tables is not None else (None, None)
        old_len = positions[:, 0]
        attn = DA.quantized_decode_attention(
            qh[:, 0], k_q, k_s, v_q, v_s, old_len, kc, ksn,
            fold=(
                k_cols, k_inv, v_cols, v_inv, new_len > old_len,
                qcos[:, 0, : hd // 2], qsin[:, 0, : hd // 2],
            ),
            theta=c.rope_theta, rope=not post_rope, packed=packed,
        ).reshape(b, 1, nh * hd)
    else:
        # XLA prefill path: dequantize the cache; "pre" mode re-applies
        # RoPE at absolute positions, "post" stored rotated keys already
        kd = _dequant_transposed(k_q, k_s, dtype, packed=packed)
        vd = _dequant_transposed(v_q, v_s, dtype, packed=packed)
        cache_pos = jnp.broadcast_to(
            jnp.arange(max_len, dtype=jnp.int32), (b, max_len)
        )
        if not post_rope:
            kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
            kd = llama.apply_rope(kd, kcos, ksin)

        # mask: cache position j visible to query row (b, i) iff
        # j <= positions[b,i] and j is a valid entry of the slot
        kv_valid = cache_pos < new_len[:, None]
        vis = (
            cache_pos[:, None, :] <= positions[:, :, None]
        ) & kv_valid[:, None, :]  # [b, s, max_len]
        mask = jnp.where(vis, 0.0, _NEG_INF)[:, None, :, :].astype(jnp.float32)
        attn = llama._attend(qh, kd, vd, mask)

    # o/down are the row-parallel half of the Megatron pair: psum over tp,
    # chunked so the all-reduce overlaps the next chunk's dequant+matmul
    nc = 4 if tp_axis is not None else 1
    attn = Q.quant_linear(
        attn, lq["o"], c.w_bits, a_bits=c.a_bits, out_dtype=dtype,
        reduce_axis=tp_axis, n_chunks=nc,
    )
    h = h + attn

    x = llama.rms_norm(h, lq["mlp_norm"], c.rms_norm_eps)
    gateup = Q.quant_linear(x, lq["gateup"], c.w_bits, a_bits=c.a_bits, out_dtype=dtype)
    gate, up = jnp.split(gateup, 2, axis=-1)
    x = Q.quant_linear(
        jax.nn.silu(gate) * up, lq["down"], c.w_bits, a_bits=c.a_bits, out_dtype=dtype,
        reduce_axis=tp_axis, n_chunks=nc,
    )
    if fold_decode:
        return h + x, (k_cols, k_inv, v_cols, v_inv)
    return h + x, (k_q, k_s, v_q, v_s)


def _forward(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [b, s] — new tokens per slot (s=1 decode)
    seq_lens: jax.Array,     # [b] current length of each slot (pre-append)
    active: jax.Array,       # [b] bool — slots that should update
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
    tp_axis=None,
    from_empty=False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run ``s`` new tokens for every slot at its own offset. Inactive slots
    compute but don't commit (their cache rows are written at a scratch
    position and lengths don't advance).

    ``from_empty=True`` (static) asserts every *active* slot has
    ``seq_lens == 0`` — the engine's prefill contract — enabling the flash
    prefill fast path (see ``_serving_layer``).

    With ``tp_axis`` this is the shard-local body of the tensor-parallel
    serving step (inference/sharded.py): qkv/gateup are column-sharded over
    heads/ffn, the KV cache is sharded over kv heads, o/down psum over the
    axis, and the vocab-sharded lm_head's logits are all-gathered."""
    c = config
    b, s = input_ids.shape
    max_len = cache["k_q"].shape[4]  # K is transposed [L, b, kvh, hd, S]

    if s == 1 and c.use_megakernel and tp_axis is None:
        from llm_qat_tpu.inference import megakernel

        if megakernel.supported(c, b, max_len):
            return megakernel.decode_step(
                qparams, c, input_ids, seq_lens, active, cache, dtype
            )

    h = jnp.take(qparams["embed"], input_ids, axis=0).astype(dtype)
    positions = seq_lens[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    # inactive slots write into the last row (scratch) and never validate it
    write_pos = jnp.where(active, seq_lens, max_len - 1).astype(jnp.int32)
    new_len = jnp.where(active, seq_lens + s, seq_lens)

    # hoist the decode kernel's K-RoPE tables out of the 32-layer scan:
    # in-kernel cos/sin was the kernel's dominant cost (see decode_attention)
    rope_tables = None
    if s == 1 and c.use_decode_kernel and c.kv_cache_rope != "post":
        hd = c.head_dim
        cache_pos = jnp.arange(max_len, dtype=jnp.int32)[None]
        kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
        # transposed [hd/2, S] to match the kernel's K layout
        rope_tables = (kcos[0, :, : hd // 2].T, ksin[0, :, : hd // 2].T)

    def body(h, xs):
        lq, k_q, k_s, v_q, v_s = xs
        out, new_kv = _serving_layer(
            h, lq, c, positions, (k_q, k_s, v_q, v_s), write_pos, new_len,
            dtype, tp_axis, rope_tables, from_empty,
        )
        return out, new_kv

    layer_xs = (
        qparams["layers"],
        cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
    )
    fold_decode = s == 1 and c.use_decode_kernel
    if fold_decode:
        # decode: the scan reads the cache in place and emits only each
        # layer's quantized current-token columns; ONE stacked commit
        # follows (cf. megakernel.decode_step) — the previous full-cache
        # ys doubled the cache footprint and its HBM write traffic
        h, (k_cols, k_invs, v_cols, v_invs) = jax.lax.scan(body, h, layer_xs)
        k_q, k_s, v_q, v_s = commit_kv_columns(
            cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
            k_cols, v_cols, k_invs, v_invs, write_pos, cache_is_packed(c),
        )
    else:
        h, (k_q, k_s, v_q, v_s) = jax.lax.scan(body, h, layer_xs)

    h = llama.rms_norm(h, qparams["final_norm"], c.rms_norm_eps)
    head = (
        qparams["embed"].T if "lm_head" not in qparams else qparams["lm_head"]
    )
    logits = jnp.matmul(
        h, head.astype(h.dtype), preferred_element_type=jnp.float32
    )
    if tp_axis is not None and "lm_head" in qparams:
        # lm_head is vocab-sharded; gather the [b, s, V/tp] shards
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    new_cache = {
        "k_q": k_q, "k_s": k_s, "v_q": v_q, "v_s": v_s, "lengths": new_len,
    }
    return logits, new_cache


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def prefill_slot(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [1, s] — one slot's (bucketed) prompt
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch-1 prefill: run one slot's prompt from empty against a
    temporary ``s``-row cache and return (logits [1, s, V], rows).

    The engine's _admit used to prefill by running the forward over the
    whole ``max_batch`` with one active slot — ``max_batch×`` redundant
    compute. This computes exactly one slot and the caller splices the
    returned rows into the persistent cache with `insert_slot`."""
    b, s = input_ids.shape
    cache = _empty_cache(config, b, s)  # prefill-only: no alignment need
    return _forward(
        qparams, config, input_ids,
        jnp.zeros((b,), jnp.int32), jnp.ones((b,), bool), cache, dtype,
        from_empty=True,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_slot(
    cache: Dict[str, jax.Array],
    rows: Dict[str, jax.Array],  # prefill_slot's cache (s rows, batch 1)
    slot: jax.Array,             # scalar int32 (traced: no recompile/slot)
) -> Dict[str, jax.Array]:
    """Splice a batch-1 prefilled cache into ``slot`` at position 0 of the
    persistent cache (donated: in-place buffer reuse). ``lengths`` stays
    host-managed by the engine."""
    upd = jax.lax.dynamic_update_slice
    z = jnp.zeros((), jnp.int32)
    return {
        "k_q": upd(cache["k_q"], rows["k_q"], (z, slot, z, z, z)),
        "k_s": upd(cache["k_s"], rows["k_s"], (z, slot, z)),
        "v_q": upd(cache["v_q"], rows["v_q"], (z, slot, z, z, z)),
        "v_s": upd(cache["v_s"], rows["v_s"], (z, slot, z)),
        "lengths": cache["lengths"],
    }


@functools.partial(
    jax.jit, static_argnames=("config", "dtype", "from_empty")
)
def serving_forward(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    active: jax.Array,
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
    from_empty=False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-device serving step (see ``_forward``)."""
    return _forward(
        qparams, config, input_ids, seq_lens, active, cache, dtype,
        from_empty=from_empty,
    )
