"""Paged quantized KV cache (paged-attention-style block tables).

North-star serving extension with no reference counterpart: instead of one
contiguous ``[b, max_len]`` region per slot (inference/model.py), K/V live
in a global pool of fixed-size **pages** shared by all slots —
``[L, n_pages, kvh, hd, page_size]`` int8 + per-token inverse scales — and
each slot maps logical positions to pages through a block table. Capacity
is pooled: total tokens = n_pages x page_size regardless of how they
distribute over slots, so long and short requests mix without reserving
worst-case memory.

The attention math is identical to the contiguous path (same pre-RoPE int8
storage, per-token scales, fp32 softmax). Decode (s=1) runs the fused
paged-attention Pallas kernel (ops/pallas/decode_attention.py): the grid
walks each slot's block table via scalar prefetch, so pages stream from
the int8 pool straight into VMEM with no gather materialization. Prefill
gathers pages with ``jnp.take`` (XLA path).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops.pallas import decode_attention as DA

_NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class PagedConfig:
    # 128 on hardware: the paged kernel's per-token scale blocks are
    # [.., page_size] and Mosaic requires >=128 lanes — page_size=64
    # lowers only in interpret mode (found on real TPU, round 5).
    page_size: int = 128
    n_pages: int = 256
    max_pages_per_seq: int = 32

    @property
    def max_seq_len(self) -> int:
        return self.page_size * self.max_pages_per_seq


def init_paged_cache(
    config: LlamaConfig, pcfg: PagedConfig
) -> Dict[str, jax.Array]:
    """K AND V pages are stored transposed — ``[L, n_pages, kvh, hd, P]``
    — so the paged decode kernel's score contraction is the canonical MXU
    matmul and V streams the same way (ops/pallas/decode_attention.py
    layout notes). With ``config.kv_cache_pack`` and ``kv_bits <= 4`` the
    pool nibble-packs: ``[.., hd/2, P]`` uint8, split-half along hd (same
    scheme as the contiguous cache, model.cache_is_packed)."""
    from llm_qat_tpu.inference import model as M

    c = config
    packed = M.cache_is_packed(c)
    hd = c.head_dim // 2 if packed else c.head_dim
    qdt = jnp.uint8 if packed else jnp.int8
    kshape = (
        c.num_hidden_layers, pcfg.n_pages, c.kv_heads, hd, pcfg.page_size,
    )
    sshape = (c.num_hidden_layers, pcfg.n_pages, pcfg.page_size)
    return {
        "k_q": jnp.zeros(kshape, qdt),
        "k_s": jnp.ones(sshape, jnp.float32),
        "v_q": jnp.zeros(kshape, qdt),
        "v_s": jnp.ones(sshape, jnp.float32),
    }


def _write_pool(pool_q, pool_s, new, pages, offsets, kvh, hd, kv_bits,
                tp_axis=None, return_fq=False, packed=False):
    """Quantize ``new`` [b, s, kvh*hd] per-token and scatter rows into the
    transposed pool at (page, offset) — pool [np, kvh, hd(/2), P] (K's
    layout; ``packed`` nibble-packs split-half along hd first). Under
    tensor parallelism ``new`` is the local head shard; the per-token scale
    comes from the pmax'd global absmax so the sharded pool holds exactly
    the single-device integers.

    ``return_fq`` additionally returns the fake-quant (int·inv_scale) value
    of ``new`` as ``[b, s, kvh, hd]`` f32 — bit-identical to gathering the
    just-written rows back out of the pool, without touching it."""
    b, s, _ = new.shape
    amax = None
    if tp_axis is not None:
        amax = jax.lax.pmax(
            jnp.max(jnp.abs(new), axis=-1, keepdims=True), tp_axis
        )
    nq, ns = Q.quantize_kv(new, kv_bits, amax=amax)
    inv = (1.0 / (ns + 1e-6))[..., 0]                    # [b, s]
    fq = None
    if return_fq:
        fq = (nq.astype(jnp.float32) * inv[..., None]).reshape(b, s, kvh, hd)
    nq = nq.reshape(b * s, kvh, hd)
    if packed:
        from llm_qat_tpu.inference.model import _pack_nibbles

        nq = _pack_nibbles(nq, axis=-1)                  # [n, kvh, hd/2]
    pg = pages.reshape(-1)
    of = offsets.reshape(-1)
    pool_q = pool_q.at[pg, :, :, of].set(nq)             # [n, kvh, hd] rows
    pool_s = pool_s.at[pg, of].set(inv.reshape(-1))
    if return_fq:
        return pool_q, pool_s, fq
    return pool_q, pool_s


def _gather_dequant(pool_q, pool_s, block_tables, dtype, packed=False):
    """Transposed pool + block table -> [b, max_tok, kvh, hd] (XLA path)."""
    b, mp = block_tables.shape
    g = jnp.take(pool_q, block_tables, axis=0)           # [b, mp, kvh, hd, P]
    s = jnp.take(pool_s, block_tables, axis=0)           # [b, mp, P]
    if packed:
        from llm_qat_tpu.inference.model import _unpack_nibbles

        g = _unpack_nibbles(g, axis=-2)
    d = g.astype(jnp.float32) * s[:, :, None, None, :]
    d = d.transpose(0, 1, 4, 2, 3)                       # [b, mp, P, kvh, hd]
    P = d.shape[2]
    return d.reshape(b, mp * P, *d.shape[3:]).astype(dtype)


def _paged_layer(
    h: jax.Array,              # [b, s, H]
    lq: Dict[str, Any],
    config: LlamaConfig,
    pcfg: PagedConfig,
    positions: jax.Array,      # [b, s]
    block_tables: jax.Array,   # [b, max_pages] page ids (unused slots -> 0)
    kv_pool: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    write_pages: jax.Array,    # [b, s] destination page id per new token
    write_offsets: jax.Array,  # [b, s] destination offset per new token
    new_len: jax.Array,        # [b] valid length after this step's write
    dtype,
    tp_axis=None,
    rope_tables=None,          # (cos, sin) [max_tok, hd/2] hoisted for decode
    from_empty=False,          # static: active slots prefill at seq_len 0
):
    c = config
    b, s, _ = h.shape
    hd = c.head_dim
    P = pcfg.page_size
    kb = min(c.kv_bits, 8)  # cache storage is int8: >=8-bit configs quantize at 8
    # flash prefill (see model._serving_layer): from-empty slots see only
    # this call's own fresh K/V, so skip the whole-table gather+dequant
    flash_prefill = (
        from_empty and s > 1 and c.use_prefill_flash
        and s % min(128, s) == 0
    )

    k_q, k_s, v_q, v_s = kv_pool
    # local head counts come from the (possibly tp-sharded) pool / fused
    # projection shapes; with tp_axis=None these equal the config's counts
    kvh = k_q.shape[1]
    from llm_qat_tpu.inference.model import cache_is_packed

    packed = cache_is_packed(c)

    x = llama.rms_norm(h, lq["attn_norm"], c.rms_norm_eps)
    qkv = Q.quant_linear(x, lq["qkv"], c.w_bits, a_bits=c.a_bits, out_dtype=dtype)
    kv_dim2 = kvh * hd
    q_dim = qkv.shape[-1] - 2 * kv_dim2
    nh = q_dim // hd
    q = qkv[..., :q_dim]
    k = qkv[..., q_dim : q_dim + kv_dim2]
    v = qkv[..., q_dim + kv_dim2 :]

    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    post_rope = c.kv_cache_rope == "post"
    if post_rope:
        # post-RoPE pool: rotate K at its absolute position BEFORE
        # quantizing, so reads never re-apply RoPE (config.kv_cache_rope)
        krot = llama.apply_rope(k.reshape(b, s, kvh, hd), qcos, qsin)
        k = krot.reshape(b, s, kvh * hd)

    # decode path (round 5): the pool is READ-ONLY inside the layer scan —
    # the current pair rides the kernel's fold operands and the caller
    # commits every layer's columns post-scan. Carrying the updated pool
    # through the scan's ys cost ~32 ms/step of u8 layout copies (XLA
    # assigns the carried pool a scatter-friendly layout, Pallas demands
    # the default — DESIGN.md "Paged decode").
    fold_decode = _paged_fold_capable(c, pcfg) and s == 1 and not flash_prefill
    if fold_decode:
        from llm_qat_tpu.inference.model import _quant_kv_cols

        k_cols, k_inv = _quant_kv_cols(k, kvh, hd, kb, tp_axis)
        v_cols, v_inv = _quant_kv_cols(v, kvh, hd, kb, tp_axis)
    else:
        k_q, k_s, fq_k = _write_pool(
            k_q, k_s, k, write_pages, write_offsets, kvh, hd, kb, tp_axis,
            return_fq=True, packed=packed,
        )
        v_q, v_s, fq_v = _write_pool(
            v_q, v_s, v, write_pages, write_offsets, kvh, hd, kb, tp_axis,
            return_fq=True, packed=packed,
        )

    qh = q.reshape(b, s, nh, hd)
    qh = llama.apply_rope(qh, qcos, qsin)

    if flash_prefill:
        from llm_qat_tpu.ops.pallas.flash_attention import flash_attention

        kf = fq_k.astype(dtype)
        vf = fq_v.astype(dtype)
        if not post_rope:
            kf = llama.apply_rope(kf, qcos, qsin)
        attn = flash_attention(qh.astype(dtype), kf, vf)
    elif fold_decode:
        kc, ksn = rope_tables if rope_tables is not None else (None, None)
        old_len = positions[:, 0]
        attn = DA.quantized_paged_attention(
            qh[:, 0], k_q, k_s, v_q, v_s, old_len, block_tables, kc, ksn,
            fold=(
                k_cols, k_inv, v_cols, v_inv, new_len > old_len,
                qcos[:, 0, : hd // 2], qsin[:, 0, : hd // 2],
            ),
            theta=c.rope_theta, rope=not post_rope, packed=packed,
        ).reshape(b, 1, nh * hd)
    else:
        max_tok = block_tables.shape[1] * P
        kd = _gather_dequant(k_q, k_s, block_tables, dtype, packed=packed)
        vd = _gather_dequant(v_q, v_s, block_tables, dtype, packed=packed)
        cache_pos = jnp.broadcast_to(
            jnp.arange(max_tok, dtype=jnp.int32), (b, max_tok)
        )
        if not post_rope:
            kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
            kd = llama.apply_rope(kd, kcos, ksin)

        kv_valid = cache_pos < new_len[:, None]
        vis = (
            cache_pos[:, None, :] <= positions[:, :, None]
        ) & kv_valid[:, None, :]
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


def _paged_fold_capable(c: LlamaConfig, pcfg: PagedConfig) -> bool:
    return c.use_decode_kernel and (
        pcfg.page_size % 128 == 0 or DA._interpret()
    )


def _commit_pool_columns(pool_q, pool_s, cols, invs, pages, offsets, packed):
    """Scatter one quantized column per (layer, slot) into the shared page
    pool — the single small write a paged decode step makes now that the
    kernel folds the current pair (mirrors model.commit_kv_columns).

    cols [L, b, kvh, hd] int8; invs [L, b, 1] f32; pages/offsets [b]."""
    nq = cols
    if packed:
        from llm_qat_tpu.inference.model import _pack_nibbles

        nq = _pack_nibbles(nq, axis=-1)                  # [L, b, kvh, hd/2]
    # per-slot dynamic_update_slice instead of one advanced-index scatter:
    # XLA's scatter assigns the 135 MB pool a different layout than the
    # Pallas kernel's default and copies the WHOLE pool in and back out
    # (~18 ms/step traced); b tiny in-place dus writes keep the layout
    L, b, kvh, hdc = nq.shape
    for i in range(b):
        pool_q = jax.lax.dynamic_update_slice(
            pool_q, nq[:, i].reshape(L, 1, kvh, hdc, 1),
            (0, pages[i], 0, 0, offsets[i]),
        )
        pool_s = jax.lax.dynamic_update_slice(
            pool_s, invs[:, i].reshape(L, 1, 1), (0, pages[i], offsets[i])
        )
    return pool_q, pool_s


def _forward(
    qparams,
    config: LlamaConfig,
    pcfg: PagedConfig,
    input_ids: jax.Array,     # [b, s]
    seq_lens: jax.Array,      # [b] length before this call
    active: jax.Array,        # [b] bool
    block_tables: jax.Array,  # [b, max_pages_per_seq] int32
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
    tp_axis=None,
    from_empty=False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Paged analog of `model.serving_forward`. The host must have assigned
    enough pages in ``block_tables`` to cover ``seq_lens + s``. Inactive
    slots write into page ``n_pages-1`` (reserved scratch) and don't
    advance.

    ``from_empty=True`` (static) asserts every *active* slot has
    ``seq_lens == 0`` — the engine's prefill contract — enabling the flash
    prefill fast path. Because writes scatter straight into the shared
    pool, prefilling a single slot is just this call with ``b == 1``.

    With ``tp_axis`` this is the shard-local body of the tensor-parallel
    paged step (inference/sharded.py): the page pool is sharded over kv
    heads, qkv/gateup are column-sharded, o/down psum over the axis, and
    the vocab-sharded lm_head's logits are all-gathered."""
    c = config
    b, s = input_ids.shape
    P = pcfg.page_size

    h = jnp.take(qparams["embed"], input_ids, axis=0).astype(dtype)
    positions = seq_lens[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    # destination (page, offset) for each new token
    page_idx = positions // P                     # logical page index
    offsets = positions % P
    pages = jnp.take_along_axis(
        block_tables, jnp.clip(page_idx, 0, block_tables.shape[1] - 1), axis=1
    )
    scratch = pcfg.n_pages - 1
    pages = jnp.where(active[:, None], pages, scratch)

    new_len = jnp.where(active, seq_lens + s, seq_lens)

    # hoist the decode kernel's K-RoPE tables (logical positions) out of
    # the layer scan; in-kernel cos/sin dominated the kernel's runtime
    rope_tables = None
    if s == 1 and c.use_decode_kernel and c.kv_cache_rope != "post":
        hd = c.head_dim
        max_tok = block_tables.shape[1] * P
        cache_pos = jnp.arange(max_tok, dtype=jnp.int32)[None]
        kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
        # transposed [hd/2, max_tok] to match the kernel's K layout
        rope_tables = (kcos[0, :, : hd // 2].T, ksin[0, :, : hd // 2].T)

    def body(h, xs):
        lq, k_q, k_s, v_q, v_s = xs
        out, kv = _paged_layer(
            h, lq, c, pcfg, positions, block_tables,
            (k_q, k_s, v_q, v_s), pages, offsets, new_len, dtype, tp_axis,
            rope_tables, from_empty,
        )
        return out, kv

    layer_xs = (
        qparams["layers"], cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"],
    )
    fold_decode = _paged_fold_capable(c, pcfg) and s == 1
    h, ys = jax.lax.scan(body, h, layer_xs)
    if fold_decode:
        from llm_qat_tpu.inference.model import cache_is_packed

        k_cols, k_invs, v_cols, v_invs = ys
        packed = cache_is_packed(c)
        wp = pages[:, 0]
        wo = offsets[:, 0]
        k_q, k_s = _commit_pool_columns(
            cache["k_q"], cache["k_s"], k_cols, k_invs, wp, wo, packed
        )
        v_q, v_s = _commit_pool_columns(
            cache["v_q"], cache["v_s"], v_cols, v_invs, wp, wo, packed
        )
    else:
        k_q, k_s, v_q, v_s = ys

    h = llama.rms_norm(h, qparams["final_norm"], c.rms_norm_eps)
    head = qparams["embed"].T if "lm_head" not in qparams else qparams["lm_head"]
    logits = jnp.matmul(h, head.astype(h.dtype), preferred_element_type=jnp.float32)
    if tp_axis is not None and "lm_head" in qparams:
        # lm_head is vocab-sharded; gather the [b, s, V/tp] shards
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits, {"k_q": k_q, "k_s": k_s, "v_q": v_q, "v_s": v_s}


@functools.partial(
    jax.jit, static_argnames=("config", "pcfg", "dtype", "from_empty")
)
def paged_forward(
    qparams,
    config: LlamaConfig,
    pcfg: PagedConfig,
    input_ids: jax.Array,
    seq_lens: jax.Array,
    active: jax.Array,
    block_tables: jax.Array,
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
    from_empty=False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Single-device paged serving step (see ``_forward``)."""
    return _forward(
        qparams, config, pcfg, input_ids, seq_lens, active, block_tables,
        cache, dtype, from_empty=from_empty,
    )


class PageAllocator:
    """Host-side free-list of pages. Page ``n_pages-1`` is reserved as the
    scratch page for inactive-slot writes."""

    def __init__(self, pcfg: PagedConfig):
        self.pcfg = pcfg
        self.free = list(range(pcfg.n_pages - 1))

    def alloc(self, n: int):
        if n > len(self.free):
            raise MemoryError(f"paged KV pool exhausted (need {n}, have {len(self.free)})")
        out = [self.free.pop() for _ in range(n)]
        return out

    def release(self, pages):
        self.free.extend(int(p) for p in pages)

    @property
    def available(self) -> int:
        return len(self.free)
