"""Quantized LLaMA decoder — functional JAX implementation.

TPU-native re-design of the reference model
(models/modeling_llama_quant.py). Differences in *architecture*, parity in
*numerics*:

  * params are a plain pytree with the per-layer weights **stacked on a
    leading layer axis** and the decoder swept with ``jax.lax.scan`` — one
    trace/compile of the layer regardless of depth, and the stacked leaves
    shard naturally over an ``fsdp`` mesh axis;
  * weights are stored ``[in, out]`` so the hot path is ``x @ w`` on the MXU
    with no transposes;
  * rematerialization is ``jax.checkpoint`` on the scan body (reference uses
    ``torch.utils.checkpoint`` per layer, modeling_llama_quant.py:732-747);
  * GQA (``num_key_value_heads``) is supported so TinyLlama/LLaMA-2 load.

Numerics kept bit-faithful to the reference:
  * every projection (q/k/v/o/gate/up/down) is `quant_dense` — per-channel
    symmetric weight fake-quant, per-token activation fake-quant
    (modeling_llama_quant.py:262-289, :210-230 via utils_quant.py:165-255);
  * KV fake-quant is applied to the *flat* ``[b, s, kv_dim]`` projections
    BEFORE head reshape, BEFORE RoPE, BEFORE cache concat
    (modeling_llama_quant.py:320-333);
  * RMSNorm accumulates in fp32 (modeling_llama_quant.py:122-123), softmax
    is fp32 (modeling_llama_quant.py:372-375), RoPE caches fp32 cos/sin;
  * embeddings, lm_head, and norm scales are never quantized
    (modeling_llama_quant.py:581-583, :793).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops.linear import quant_dense
from llm_qat_tpu.ops.quantize import kv_fake_quant

Params = Dict[str, Any]

_NEG_INF = -1e9  # additive mask value; fp32-softmax-safe


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def init_params(
    config: LlamaConfig, key: jax.Array, dtype=jnp.float32
) -> Params:
    """Random init (normal(0, 0.02) like the reference's `_init_weights`,
    modeling_llama_quant.py:497-505). Layer weights are stacked on axis 0."""
    c = config
    hd, nh, kvh = c.head_dim, c.num_attention_heads, c.kv_heads
    L = c.num_hidden_layers
    keys = jax.random.split(key, 10)

    def w(k, shape):
        return (jax.random.normal(k, shape) * 0.02).astype(dtype)

    params: Params = {
        "embed": w(keys[0], (c.vocab_size, c.hidden_size)),
        "layers": {
            "attn_norm": jnp.ones((L, c.hidden_size), dtype),
            "q": w(keys[1], (L, c.hidden_size, nh * hd)),
            "k": w(keys[2], (L, c.hidden_size, kvh * hd)),
            "v": w(keys[3], (L, c.hidden_size, kvh * hd)),
            "o": w(keys[4], (L, nh * hd, c.hidden_size)),
            "mlp_norm": jnp.ones((L, c.hidden_size), dtype),
            "gate": w(keys[5], (L, c.hidden_size, c.intermediate_size)),
            "up": w(keys[6], (L, c.hidden_size, c.intermediate_size)),
            "down": w(keys[7], (L, c.intermediate_size, c.hidden_size)),
        },
        "final_norm": jnp.ones((c.hidden_size,), dtype),
    }
    if not c.tie_word_embeddings:
        params["lm_head"] = w(keys[8], (c.hidden_size, c.vocab_size))
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """RMSNorm with fp32 accumulation (modeling_llama_quant.py:112-129)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dtype) * scale


def rope_cos_sin(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """fp32 cos/sin tables for the given absolute positions ``[b, s]``.

    Matches LlamaRotaryEmbedding (modeling_llama_quant.py:132-178):
    ``inv_freq = theta^(-2i/d)``, table is ``concat(freqs, freqs)``.
    Returns ``[b, s, head_dim]`` each.
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [b, s, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE (modeling_llama_quant.py:181-196). ``x`` is
    ``[b, s, heads, head_dim]``; cos/sin ``[b, s, head_dim]``."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return x * c + rotated * s


def _rope_rotate(x: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """Rotate-half RoPE on the last dim with pre-broadcast cos/sin (the
    flash-layout path; same math as :func:`apply_rope`)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * c.astype(x.dtype) + rotated * s.astype(x.dtype)


def _attend(
    q: jax.Array,  # [b, s_q, nh, hd]
    k: jax.Array,  # [b, s_kv, kvh, hd]
    v: jax.Array,  # [b, s_kv, kvh, hd]
    mask: jax.Array,  # [b, 1, s_q, s_kv] additive (0 or -inf)
) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax, full score matrix
    (modeling_llama_quant.py:352-377). GQA via head-group einsum — the kv
    head dim stays un-repeated so no materialized repeat_kv copy."""
    b, s_q, nh, hd = q.shape
    kvh = k.shape[2]
    groups = nh // kvh
    qg = q.reshape(b, s_q, kvh, groups, hd)
    # scores: [b, kvh, groups, s_q, s_kv]
    acc_t = jnp.promote_types(q.dtype, jnp.float32)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=acc_t)
    scores = scores / jnp.sqrt(hd).astype(scores.dtype)
    scores = scores + mask[:, :, None, :, :]
    probs = jax.nn.softmax(scores.astype(acc_t), axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=acc_t,
    )
    return out.reshape(b, s_q, nh * hd).astype(q.dtype)


def decoder_layer(
    h: jax.Array,
    lp: Params,
    config: LlamaConfig,
    mask: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cache_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    use_flash: bool = False,
    flash_lengths: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[Tuple[jax.Array, jax.Array]]]:
    """One decoder block (modeling_llama_quant.py:396-469).

    With ``cache_kv=(k_cache, v_cache)`` of shape ``[b, max_len, kvh, hd]``
    the new (quantized, RoPE'd) K/V are written at ``cache_index`` and
    attention runs over the full cache; without, it is the training path.
    """
    c = config
    b, s, _ = h.shape
    hd, nh, kvh = c.head_dim, c.num_attention_heads, c.kv_heads
    qd = dict(
        w_bits=c.w_bits, a_bits=c.a_bits, symmetric=c.symmetric,
        act_layerwise=c.act_layerwise, weight_layerwise=c.weight_layerwise,
        fused=c.fused_qat_matmul,
    )
    # producer-fused RMSNorm+quant / SiLU+quant path (ops/fused_layer.py):
    # same STE numerics, one HBM pass per activation instead of three
    use_fused_norm = False
    if (
        c.fused_norm_quant and c.fused_qat_matmul and c.symmetric
        and not c.act_layerwise and not c.weight_layerwise
    ):
        from llm_qat_tpu.ops import fused_layer

        use_fused_norm = fused_layer.supported(
            h.reshape(-1, h.shape[-1]), c.w_bits, c.a_bits
        )

    # --- attention ---
    # flash-layout fast path (round 5): the q/k/v projections EMIT the
    # flash kernel's head-major layout and the o projection CONSUMES it,
    # so the ~15 ms/step of XLA relayout copies around the kernel vanish
    # into the int8 einsums (ops/fused_layer.py "Flash-layout attention
    # projections"). Training path only (no cache) — numerics identical
    # to the flat path (integer dots are exact; tested).
    if use_fused_norm and use_flash and cache_kv is None:
        q5, k4, v4 = fused_layer.fused_norm_qkv_flash(
            h, lp["attn_norm"], lp["q"], lp["k"], lp["v"], kvh,
            w_bits=c.w_bits, a_bits=c.a_bits, eps=c.rms_norm_eps,
        )
        # KV fake-quant at the reference hook (pre-RoPE, pre-cache); the
        # per-token absmax spans (kvh, d) == the flat hidden dim.
        from llm_qat_tpu.ops.quantize import sym_fake_quant

        if c.kv_bits < 32:
            k4 = sym_fake_quant(k4, c.kv_bits, (1, 3))
            v4 = sym_fake_quant(v4, c.kv_bits, (1, 3))
        cs = cos[:, None, None, :, :], sin[:, None, None, :, :]
        q5 = _rope_rotate(q5, *cs)
        k4 = _rope_rotate(k4, cos[:, None, :, :], sin[:, None, :, :])

        from llm_qat_tpu.ops.pallas.flash_attention import flash_attention_gqa

        groups = nh // kvh
        if flash_lengths is None:
            lens_B = jnp.full((b * kvh,), s, jnp.int32)
        else:
            lens_B = jnp.repeat(flash_lengths.astype(jnp.int32), kvh)
        out = flash_attention_gqa(
            q5.reshape(b * kvh, groups, s, hd),
            k4.reshape(b * kvh, s, hd),
            v4.reshape(b * kvh, s, hd),
            lens_B,
            512, 1024, c.flash_softmax_bf16,
        )
        attn = fused_layer.fused_attn_out_dense(
            out.reshape(b, kvh, groups, s, hd), lp["o"],
            w_bits=c.w_bits, a_bits=c.a_bits,
        )
        h = h + attn
        # --- MLP ---
        gate, up = fused_layer.fused_norm_dense(
            h, lp["mlp_norm"], (lp["gate"], lp["up"]),
            w_bits=c.w_bits, a_bits=c.a_bits, eps=c.rms_norm_eps,
        )
        if c.fused_silu_quant:
            x = fused_layer.fused_silu_mul_dense(
                gate, up, lp["down"], w_bits=c.w_bits, a_bits=c.a_bits
            )
        else:
            x = quant_dense(jax.nn.silu(gate) * up, lp["down"], **qd)
        return h + x, None

    if use_fused_norm:
        q, k, v = fused_layer.fused_norm_dense(
            h, lp["attn_norm"], (lp["q"], lp["k"], lp["v"]),
            w_bits=c.w_bits, a_bits=c.a_bits, eps=c.rms_norm_eps,
        )
    else:
        x = rms_norm(h, lp["attn_norm"], c.rms_norm_eps)
        q = quant_dense(x, lp["q"], **qd)
        k = quant_dense(x, lp["k"], **qd)
        v = quant_dense(x, lp["v"], **qd)

    # KV-cache fake-quant at the reference's exact hook point: flat [b, s,
    # kv_dim], pre-reshape, pre-RoPE, pre-cache (modeling_llama_quant.py:320-333).
    k = kv_fake_quant(k, c.kv_bits)
    v = kv_fake_quant(v, c.kv_bits)

    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, kvh, hd)
    v = v.reshape(b, s, kvh, hd)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    new_cache = None
    if cache_kv is not None:
        k_cache, v_cache = cache_kv
        k_cache = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype), (0, cache_index, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype), (0, cache_index, 0, 0))
        k, v = k_cache, v_cache
        new_cache = (k_cache, v_cache)

    if use_flash and cache_kv is None:
        from llm_qat_tpu.ops.pallas.flash_attention import flash_attention

        attn = flash_attention(
            q, k, v, lengths=flash_lengths,
            softmax_bf16=c.flash_softmax_bf16,
        )
    else:
        attn = _attend(q, k, v, mask)
    attn = quant_dense(attn, lp["o"], **qd)
    h = h + attn

    # --- MLP (modeling_llama_quant.py:200-235: down(silu(gate(x)) * up(x))) ---
    if use_fused_norm:
        from llm_qat_tpu.ops import fused_layer

        gate, up = fused_layer.fused_norm_dense(
            h, lp["mlp_norm"], (lp["gate"], lp["up"]),
            w_bits=c.w_bits, a_bits=c.a_bits, eps=c.rms_norm_eps,
        )
    else:
        x = rms_norm(h, lp["mlp_norm"], c.rms_norm_eps)
        gate = quant_dense(x, lp["gate"], **qd)
        up = quant_dense(x, lp["up"], **qd)
    if use_fused_norm and c.fused_silu_quant:
        # opt-in: measured slower than XLA's up-matmul epilogue fusion on
        # v5e at the canonical prefill shape (see config.fused_silu_quant)
        x = fused_layer.fused_silu_mul_dense(
            gate, up, lp["down"], w_bits=c.w_bits, a_bits=c.a_bits
        )
    else:
        x = quant_dense(jax.nn.silu(gate) * up, lp["down"], **qd)
    return h + x, new_cache


# ---------------------------------------------------------------------------
# Full forward (training / scoring path)
# ---------------------------------------------------------------------------


def causal_mask(
    b: int, s: int, attention_mask: Optional[jax.Array], dtype=jnp.float32
) -> jax.Array:
    """Additive ``[b, 1, s, s]`` mask: causal, optionally combined with a
    ``[b, s]`` padding mask (modeling_llama_quant.py:60-109, :601-628)."""
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    m = causal[None, None, :, :]
    if attention_mask is not None:
        pad = attention_mask.astype(jnp.bool_)[:, None, None, :]
        m = m & pad
    return jnp.where(m, 0.0, _NEG_INF).astype(dtype)


def head_matrix(params: Params, config: LlamaConfig) -> jax.Array:
    """The (unquantized) lm_head weight ``[H, V]``
    (modeling_llama_quant.py:793; tied embeddings transpose)."""
    return params["embed"].T if config.tie_word_embeddings else params["lm_head"]


def _logits(params: Params, config: LlamaConfig, h: jax.Array) -> jax.Array:
    h = rms_norm(h, params["final_norm"], config.rms_norm_eps)
    head = head_matrix(params, config)
    # lm_head is a plain fp Linear in the reference (modeling_llama_quant.py:793)
    acc_t = jnp.promote_types(h.dtype, jnp.float32)
    return jnp.matmul(h, head.astype(h.dtype), preferred_element_type=acc_t)


def final_hidden(
    params: Params, config: LlamaConfig, input_ids: jax.Array, **kw
) -> jax.Array:
    """Backbone + final RMSNorm, WITHOUT the lm_head — ``[b, s, H]``.

    Loss kernels that chunk the vocab projection (training.trainer's
    chunked KD loss) consume this so the full fp32 ``[b, s, V]`` logits
    never materialize (SURVEY.md §7 "KD at batch 1 x 2048 x KL over 32k
    vocab ... chunk the loss")."""
    h = backbone(params, config, input_ids, **kw)
    return rms_norm(h, params["final_norm"], config.rms_norm_eps)


def _check_prefix_mask(is_prefix) -> None:
    """Host-side guard for the flash path's right-padded mask contract.

    Runs as a ``jax.debug.callback`` when the mask is a tracer (jitted
    callers): raising here surfaces a loud error instead of silently wrong
    attention for non-prefix masks (left padding, packed sequences)."""
    if not bool(is_prefix):
        raise ValueError(
            "flash attention path requires a right-padded prefix "
            "attention_mask (mask == arange(s) < lengths[:, None]); got a "
            "non-monotone mask under jit. Disable use_flash_attention or "
            "right-pad the batch."
        )


def backbone(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,  # [b, s] int32
    *,
    attention_mask: Optional[jax.Array] = None,  # [b, s] 1=keep
    positions: Optional[jax.Array] = None,  # [b, s] absolute positions
    remat: bool = False,
    remat_policy: str = "save_attn",
    dtype=None,
) -> jax.Array:
    """Decoder sweep returning the final hidden states ``[b, s, H]``
    (pre-final-norm — `LlamaModel` body, modeling_llama_quant.py:631-785).

    The 32-layer loop of the reference (modeling_llama_quant.py:724-756)
    becomes a single ``lax.scan`` over stacked layer params; ``remat=True``
    wraps the body in ``jax.checkpoint`` (reference's gradient checkpointing,
    run_train.sh:36). ``remat_policy="save_attn"`` keeps each layer's
    attention output ([b, s, H] bf16 — 34 MB/layer at b=4 s=2048 H=2048)
    so the backward never re-runs the flash kernel; "none" saves nothing
    (the reference's torch.utils.checkpoint behavior).
    """
    c = config
    b, s = input_ids.shape
    h = jnp.take(params["embed"], input_ids, axis=0)
    if dtype is not None:
        h = h.astype(dtype)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta)
    # flash path: full-sequence attention with block-aligned s. A padding
    # mask rides as per-sequence lengths (right-padded contract — the only
    # mask shape the data/eval pipelines produce); columns >= length are
    # masked inside the kernel, so padded-batch QAT stays on flash instead
    # of falling back to the O(s²) einsum (VERDICT round-1 item 5).
    # The lengths reduction is only valid for a monotone right-padded
    # prefix mask. A concrete non-prefix mask (left padding, packed docs)
    # falls back to the exact einsum path here; a traced one cannot branch
    # in Python, so a host callback raises at run time instead of letting
    # the kernel silently attend wrong.
    use_flash = (
        c.use_flash_attention and s % min(128, s) == 0 and s >= 16
    )
    flash_lengths = None
    if use_flash and attention_mask is not None:
        flash_lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        is_prefix = jnp.all(
            attention_mask.astype(bool)
            == (jnp.arange(s)[None, :] < flash_lengths[:, None])
        )
        if isinstance(is_prefix, jax.core.Tracer):
            # the guarantee is a NaN sentinel folded into the hidden state:
            # a non-prefix mask can never silently produce wrong-but-finite
            # logits (the --debug_nans sanitizer or any loss check trips on
            # it; see _check_prefix_mask for the failure explanation). A
            # jax.debug.callback used to ALSO raise the readable error, but
            # host callbacks are unsupported on the axon TPU runtime
            # (UNIMPLEMENTED at execute time) and best-effort/swallowed
            # elsewhere (ADVICE r3), so the sentinel is the contract.
            h = h + jnp.where(is_prefix, 0.0, jnp.nan).astype(h.dtype)
        elif not bool(is_prefix):
            use_flash = False
            flash_lengths = None
    mask = (
        jnp.zeros((b, 1, 1, 1), jnp.float32)
        if use_flash
        else causal_mask(b, s, attention_mask, dtype=jnp.float32)
    )

    def body(h, lp):
        out, _ = decoder_layer(
            h, lp, c, mask, cos, sin, use_flash=use_flash,
            flash_lengths=flash_lengths,
        )
        # keep the carry at the activation dtype: f32 master params under a
        # bf16 compute dtype would otherwise promote the residual stream and
        # break the scan carry contract
        return out.astype(h.dtype), None

    if remat:
        # "save_attn" saves the flash kernel's output + log-sum-exp (named
        # inside its custom_vjp fwd) so the backward never re-runs the
        # forward attention kernel
        policy = (
            jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"
            )
            if remat_policy == "save_attn"
            else None
        )
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)
    h, _ = jax.lax.scan(body, h, params["layers"])
    return h


def forward(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,
    **kw,
) -> jax.Array:
    """Causal-LM forward: backbone + final norm + fp lm_head -> fp32 logits
    ``[b, s, vocab]`` (LlamaForCausalLM, modeling_llama_quant.py:820-907)."""
    h = backbone(params, config, input_ids, **kw)
    return _logits(params, config, h)


# ---------------------------------------------------------------------------
# Sequence classification head (LlamaForSequenceClassification,
# modeling_llama_quant.py:970-1050)
# ---------------------------------------------------------------------------


def init_classifier_params(
    config: LlamaConfig, key: jax.Array, num_labels: int, dtype=jnp.float32
) -> Params:
    """Backbone params + a bias-free ``score`` head ``[H, num_labels]``;
    no lm_head (the reference ignores it on load)."""
    params = init_params(config.replace(tie_word_embeddings=True), key, dtype)
    k = jax.random.fold_in(key, num_labels)
    params["score"] = (
        jax.random.normal(k, (config.hidden_size, num_labels)) * 0.02
    ).astype(dtype)
    return params


def classify(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,
    *,
    pad_token_id: Optional[int] = None,
    attention_mask: Optional[jax.Array] = None,
    remat: bool = False,
    dtype=None,
) -> jax.Array:
    """Pooled classification logits ``[b, num_labels]``: score every
    position, pool at the last non-pad token (or the last position when no
    ``pad_token_id`` — reference modeling_llama_quant.py:1035-1050)."""
    h = backbone(
        params, config, input_ids,
        attention_mask=attention_mask, remat=remat, dtype=dtype,
    )
    h = rms_norm(h, params["final_norm"], config.rms_norm_eps)
    logits = jnp.matmul(
        h, params["score"].astype(h.dtype), preferred_element_type=jnp.float32
    )  # [b, s, num_labels]
    b, s = input_ids.shape
    if pad_token_id is None:
        lengths = jnp.full((b,), s - 1, jnp.int32)
    else:
        lengths = jnp.sum(input_ids != pad_token_id, axis=-1) - 1
    return logits[jnp.arange(b), lengths]


def classification_loss(
    pooled_logits: jax.Array, labels: jax.Array
) -> jax.Array:
    """CE for multi-class, MSE for regression (num_labels==1) — the
    reference's problem-type dispatch (modeling_llama_quant.py:1052+)."""
    if pooled_logits.shape[-1] == 1:
        return jnp.mean((pooled_logits[..., 0] - labels) ** 2)
    lp = jax.nn.log_softmax(pooled_logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(lp, labels[:, None], axis=-1))


def causal_lm_loss(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Shifted next-token cross-entropy (modeling_llama_quant.py:884-895):
    mean over valid positions of ``-log p(labels[1:] | logits[:-1])``."""
    logits = logits[:, :-1, :]
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    )
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )


def causal_lm_loss_sum(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> Tuple[jax.Array, jax.Array]:
    """Unreduced variant of :func:`causal_lm_loss`: returns
    ``(nll_sum, valid_token_count)`` so callers can aggregate a
    token-weighted mean across batches on the host."""
    logits = logits[:, :-1, :]
    labels = labels[:, 1:]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(
        logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1
    )
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(valid, nll, 0.0)), jnp.sum(valid).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache decode path (generation)
# ---------------------------------------------------------------------------


def init_cache(
    config: LlamaConfig, batch: int, max_len: int, dtype=jnp.float32
) -> Dict[str, jax.Array]:
    """Fixed-size stacked KV cache. Holds the *fake-quantized*, RoPE'd K and
    quantized V exactly as the reference caches them
    (modeling_llama_quant.py:345-350). ``index`` is the write position."""
    c = config
    shape = (c.num_hidden_layers, batch, max_len, c.kv_heads, c.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
    }


def forward_with_cache(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,  # [b, s] — prompt chunk or single decode token
    cache: Dict[str, jax.Array],
    *,
    dtype=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Run ``s`` new tokens against the cache (prefill when ``index==0``,
    decode when ``s==1``). Returns fp32 logits ``[b, s, vocab]`` and the
    updated cache. Shapes are static; the current length lives in
    ``cache['index']`` so this jits once per ``s``."""
    c = config
    b, s = input_ids.shape
    max_len = cache["k"].shape[2]
    index = cache["index"]

    h = jnp.take(params["embed"], input_ids, axis=0)
    if dtype is not None:
        h = h.astype(dtype)
    positions = index + jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
    cos, sin = rope_cos_sin(positions, c.head_dim, c.rope_theta)

    # additive mask over the fixed-size cache: key j visible to query i iff
    # j < index + i + 1  (causal over absolute positions)
    kv_pos = jnp.arange(max_len, dtype=jnp.int32)
    visible = kv_pos[None, None, None, :] <= positions[:, None, :, None]
    mask = jnp.where(visible, 0.0, _NEG_INF).astype(jnp.float32)

    def body(h, xs):
        lp, k_cache, v_cache = xs
        out, new_kv = decoder_layer(
            h, lp, c, mask, cos, sin,
            cache_kv=(k_cache, v_cache), cache_index=index,
        )
        # keep the carry at the activation dtype (f32 params + bf16 compute)
        return out.astype(h.dtype), new_kv

    h, (new_k, new_v) = jax.lax.scan(
        body, h, (params["layers"], cache["k"], cache["v"])
    )
    logits = _logits(params, c, h)
    return logits, {"k": new_k, "v": new_v, "index": index + s}
