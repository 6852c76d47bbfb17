"""Context-parallel (ring) training forward: sequence sharded over a ``cp``
mesh axis.

The long-context training path SURVEY.md §5 calls for: activations are
sharded on the sequence dim, every projection/norm is local, and attention
runs as the ICI ring of `parallel.ring_attention` — per-device peak memory
is O((s/N)²) for scores and O(s/N) for activations, so context scales
linearly with the ring size.

Numerics: the KV fake-quant happens at the reference hook point
(pre-reshape, pre-RoPE — models/llama.py `decoder_layer` semantics) on the
*local* tokens; per-token quantization makes this exactly the single-device
math. Ring transport can additionally compress blocks to int8
(``ring_transport_bits=8``) — that is a second quantization on top of the
model's own KV quant, so the default (None) keeps training numerics
identical to `llama.forward` and trades ICI bandwidth for fidelity.

Params are replicated inside the shard_map (combine with ZeRO-2-style
optimizer-state sharding; full FSDP-inside-ring is a later composition).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops.linear import quant_dense
from llm_qat_tpu.ops.quantize import kv_fake_quant
from llm_qat_tpu.parallel.ring_attention import ring_flash_attention_local


def _cp_decoder_layer(
    h: jax.Array,            # [b, sl, H] local chunk
    lp,
    config: LlamaConfig,
    cos: jax.Array,
    sin: jax.Array,
    axis: str,
    n: int,
    ring_transport_bits: Optional[int],
):
    c = config
    b, sl, _ = h.shape
    hd, nh, kvh = c.head_dim, c.num_attention_heads, c.kv_heads
    qd = dict(
        w_bits=c.w_bits, a_bits=c.a_bits, symmetric=c.symmetric,
        act_layerwise=c.act_layerwise, weight_layerwise=c.weight_layerwise,
        fused=c.fused_qat_matmul,
    )

    x = llama.rms_norm(h, lp["attn_norm"], c.rms_norm_eps)
    q = quant_dense(x, lp["q"], **qd)
    k = quant_dense(x, lp["k"], **qd)
    v = quant_dense(x, lp["v"], **qd)

    # model KV fake-quant at the reference hook point (local tokens)
    k = kv_fake_quant(k, c.kv_bits)
    v = kv_fake_quant(v, c.kv_bits)

    q = q.reshape(b, sl, nh, hd)
    k = k.reshape(b, sl, kvh, hd)
    v = v.reshape(b, sl, kvh, hd)

    q = llama.apply_rope(q, cos, sin)
    k = llama.apply_rope(k, cos, sin)

    # flash ring body (round 5): GQA rides the kernel's group dim, so K/V
    # travel the ring UN-repeated — ICI bytes / groups vs the old
    # pre-repeat, and the per-step attention runs as the Pallas flash
    # kernel instead of an fp32 O((s/N)^2) einsum
    attn = ring_flash_attention_local(
        q, k, v, axis_name=axis, n=n, kv_bits=ring_transport_bits
    )
    attn = attn.reshape(b, sl, nh * hd).astype(h.dtype)
    attn = quant_dense(attn, lp["o"], **qd)
    h = h + attn

    x = llama.rms_norm(h, lp["mlp_norm"], c.rms_norm_eps)
    gate = quant_dense(x, lp["gate"], **qd)
    up = quant_dense(x, lp["up"], **qd)
    x = quant_dense(jax.nn.silu(gate) * up, lp["down"], **qd)
    return h + x


def cp_forward(
    params,
    config: LlamaConfig,
    input_ids: jax.Array,  # [b, s] global
    mesh: Mesh,
    axis: str = "cp",
    *,
    remat: bool = False,
    dtype=None,
    ring_transport_bits: Optional[int] = None,
) -> jax.Array:
    """Ring-parallel full-sequence forward -> fp32 logits [b, s, vocab]
    (sequence-sharded over ``axis``)."""
    c = config
    n = mesh.shape[axis]
    b, s = input_ids.shape
    if s % n:
        raise ValueError(f"seq {s} not divisible by cp={n}")
    sl = s // n

    def local_fn(params, ids_local):
        idx = jax.lax.axis_index(axis)
        h = jnp.take(params["embed"], ids_local, axis=0)
        if dtype is not None:
            h = h.astype(dtype)
        positions = idx * sl + jnp.broadcast_to(
            jnp.arange(sl, dtype=jnp.int32), (b, sl)
        )
        cos, sin = llama.rope_cos_sin(positions, c.head_dim, c.rope_theta)

        def body(h, lp):
            out = _cp_decoder_layer(
                h, lp, c, cos, sin, axis, n, ring_transport_bits
            )
            # keep the carry at the activation dtype (f32 params + bf16 compute)
            return out.astype(h.dtype), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        h, _ = jax.lax.scan(body, h, params["layers"])
        return llama._logits(params, c, h)

    pspec = jax.tree.map(lambda _: P(), params)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(pspec, P(None, axis)),
        out_specs=P(None, axis, None),
        check_vma=False,  # flash ring pallas out_shapes carry no vma
    )
    return fn(params, input_ids)
