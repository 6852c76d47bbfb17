"""Unrolled decode step: static-layer-indexed kernels over stacked arrays.

The scan-based decode step (inference/model.py) tops out at ~19% of the
weight+KV HBM speed-of-light: XLA materializes an HBM copy of every
dynamic-slice of the stacked weights/cache that feeds a Pallas custom call,
so each step re-copies ~44 MB of weights + ~8.5 MB of cache per layer
before the kernels read a byte (DESIGN.md "Decode speed-of-light study";
two other fixes — static slices, scalar-prefetch index maps — measured
slower for reasons recorded there).

This path removes the copies structurally:

  * The Python layer loop is unrolled; every matmul / attention kernel call
    receives the ENTIRE stacked weight / KV-cache array and selects its
    layer's blocks *statically in the BlockSpec index map*
    (ops/pallas/quant_matmul.int8_matmul_stacked,
    decode_attention.quantized_decode_attention_stacked). No XLA-level
    slice exists, so nothing is copied; the kernel's own grid pipeline
    double-buffers the weight tiles from their home HBM addresses.
  * The KV cache stays READ-ONLY through all layers. The current token's
    K/V are folded into the attention kernel as one extra online-softmax
    pair, and all layers' new rows are committed in ONE batched
    dynamic_update_slice after the loop (a ~L*b*kv_dim write, not a
    184 MB cache round-trip per layer).

Numerics are identical to the scan path up to fp summation order in the
online softmax (the integer cache contents are bit-identical; tested in
tests/test_unrolled.py). Enable with ``config.use_unrolled_decode``.

Reference parity note: the reference has no serving path at all (its
generation runs fake-quant fp matmuls under HF generate,
models/modeling_llama_quant.py:909-954); this is north-star work.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.ops.pallas import decode_attention as DA
from llm_qat_tpu.ops.pallas import quant_matmul as QM


def _quant_linear_stacked(
    x: jax.Array,              # [b, K] fp
    qw: Dict[str, jax.Array],  # {"q": [L, K(,/2), N] int, "s": [L, 1, N]}
    w_bits: int,
    layer: int,
    a_bits: int = 8,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Per-token activation quant + layer-indexed stacked int matmul.

    Same ``a_bits`` contract as quantized.quant_linear: 3..8 on the int8
    MXU, <=2 / >=16 served fp against the dequantized layer slice, 9..15
    raises (int8 activation container)."""
    if 8 < a_bits < 16:
        raise NotImplementedError(
            f"serving activation container is int8: a_bits={a_bits}"
        )
    if a_bits <= 2 or a_bits >= 16:
        w = Q.dequant_weight(
            {"q": qw["q"][layer], "s": qw["s"][layer]}, w_bits, dtype=x.dtype
        )
        return jnp.matmul(x, w).astype(out_dtype)
    xq, sx = QM.quantize_per_token(x, a_bits)
    xq, M = QM._pad_rows(xq, 32)
    sx, _ = QM._pad_rows(sx, 32)
    if w_bits == 8:
        out = QM.int8_matmul_stacked(
            xq, qw["q"], sx, qw["s"], layer=layer, out_dtype=out_dtype
        )
    else:
        out = QM.int4_matmul_stacked(
            xq, qw["q"], sx, qw["s"], layer=layer, out_dtype=out_dtype
        )
    return out[:M]


def decode_step(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [b, 1]
    seq_lens: jax.Array,     # [b] current length (pre-append)
    active: jax.Array,       # [b] bool
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode token per slot; same contract as model._forward at s=1."""
    c = config
    if c.w_bits not in (4, 8):
        raise NotImplementedError(
            f"unrolled decode supports w4/w8 serving, got w{c.w_bits}"
        )
    if c.kv_cache_pack and c.kv_bits <= 4:
        raise NotImplementedError(
            "unrolled decode reads the int8 cache container; disable "
            "kv_cache_pack for use_unrolled_decode at kv_bits<=4"
        )
    b, s = input_ids.shape
    assert s == 1, input_ids.shape
    L = c.num_hidden_layers
    hd = c.head_dim
    kb = min(c.kv_bits, 8)
    post_rope = c.kv_cache_rope == "post"
    k_q, k_s, v_q, v_s = cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"]
    max_len = k_q.shape[-1]
    kvh = k_q.shape[2]
    kv_dim = kvh * hd

    h = jnp.take(qparams["embed"], input_ids, axis=0).astype(dtype)  # [b,1,H]
    positions = seq_lens[:, None]                      # [b, 1]
    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    inc = active.astype(jnp.int32)

    # hoisted cache-key RoPE tables, transposed [hd/2, S] (pre mode only)
    k_cos = k_sin = None
    if not post_rope:
        cache_pos = jnp.arange(max_len, dtype=jnp.int32)[None]
        tc, ts = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
        k_cos, k_sin = tc[0, :, : hd // 2].T, ts[0, :, : hd // 2].T

    layers = qparams["layers"]
    new_kq, new_ks, new_vq, new_vs = [], [], [], []
    for l in range(L):
        x = llama.rms_norm(h, layers["attn_norm"][l], c.rms_norm_eps)
        qkv = _quant_linear_stacked(
            x[:, 0], layers["qkv"], c.w_bits, l, c.a_bits, dtype
        )[:, None]                                     # [b, 1, q+2kv]
        q_dim = qkv.shape[-1] - 2 * kv_dim
        nh = q_dim // hd
        q = qkv[..., :q_dim]
        k = qkv[..., q_dim : q_dim + kv_dim]
        v = qkv[..., q_dim + kv_dim :]

        if post_rope:
            kh = llama.apply_rope(k.reshape(b, 1, kvh, hd), qcos, qsin)
            k = kh.reshape(b, 1, kv_dim)

        # quantize the new K/V per token — the SAME integers model._write_kv
        # would have written (modeling_llama_quant.py:320-333 hook) — but
        # keep them aside for the post-loop batched commit
        kq_i, ks_ = Q.quantize_kv(k, kb)               # int8 [b,1,kv], [b,1,1]
        vq_i, vs_ = Q.quantize_kv(v, kb)
        k_inv = (1.0 / (ks_ + 1e-6))[..., 0]           # [b, 1] inverse scales
        v_inv = (1.0 / (vs_ + 1e-6))[..., 0]
        fq_k = (kq_i.astype(jnp.float32) * k_inv[..., None]).reshape(
            b, 1, kvh, hd
        )
        fq_v = (vq_i.astype(jnp.float32) * v_inv[..., None]).reshape(
            b, 1, kvh, hd
        )
        k_fold = fq_k if post_rope else llama.apply_rope(fq_k, qcos, qsin)

        qh = llama.apply_rope(q.reshape(b, 1, nh, hd), qcos, qsin)
        attn = DA.quantized_decode_attention_stacked(
            qh[:, 0].astype(dtype), k_q, k_s, v_q, v_s, seq_lens, inc,
            k_fold[:, 0].astype(dtype), fq_v[:, 0].astype(dtype),
            k_cos, k_sin, layer=l, theta=c.rope_theta, rope=not post_rope,
        ).reshape(b, 1, nh * hd)

        attn = _quant_linear_stacked(
            attn[:, 0], layers["o"], c.w_bits, l, c.a_bits, dtype
        )[:, None]
        h = h + attn

        x = llama.rms_norm(h, layers["mlp_norm"][l], c.rms_norm_eps)
        gateup = _quant_linear_stacked(
            x[:, 0], layers["gateup"], c.w_bits, l, c.a_bits, dtype
        )
        gate, up = jnp.split(gateup, 2, axis=-1)
        x = _quant_linear_stacked(
            jax.nn.silu(gate) * up, layers["down"], c.w_bits, l, c.a_bits,
            dtype,
        )[:, None]
        h = h + x

        # cache layout: K and V both transposed [*, kvh, hd, S]
        new_kq.append(kq_i.reshape(b, kvh, hd, 1))
        new_ks.append(k_inv)                           # [b, 1]
        new_vq.append(vq_i.reshape(b, kvh, hd, 1))
        new_vs.append(v_inv)

    # one batched commit of all layers' new rows (inactive slots write the
    # scratch row S-1 and never validate it — model._forward convention)
    write_pos = jnp.where(active, seq_lens, max_len - 1).astype(jnp.int32)
    new_len = jnp.where(active, seq_lens + 1, seq_lens)
    nk = jnp.stack(new_kq)                             # [L, b, kvh, hd, 1]
    ns = jnp.stack(new_ks)[..., 0]                     # [L, b]
    nv = jnp.stack(new_vq)                             # [L, b, kvh, hd, 1]
    nw = jnp.stack(new_vs)[..., 0]                     # [L, b]

    def write_slot(kq, ks, vq, vs, nk, ns, nv, nw, wp):
        # per-slot views: kq [L, kvh, hd, S], ks [L, S]
        upd = jax.lax.dynamic_update_slice
        z = jnp.zeros((), jnp.int32)
        return (
            upd(kq, nk, (z, z, z, wp)),
            upd(ks, ns[:, None], (z, wp)),
            upd(vq, nv, (z, z, z, wp)),
            upd(vs, nw[:, None], (z, wp)),
        )

    k_q, k_s, v_q, v_s = jax.vmap(
        write_slot,
        in_axes=(1, 1, 1, 1, 1, 1, 1, 1, 0),
        out_axes=1,
    )(k_q, k_s, v_q, v_s, nk, ns, nv, nw, write_pos)

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
