"""HF checkpoint <-> llm_qat_tpu pytree conversion.

The reference loads HF-format checkpoints directly
(`LlamaForCausalLM.from_pretrained`, train.py:55-62) and saves latent fp
weights back in HF format (utils/utils.py:39-49). We interoperate with the
same on-disk format: ``config.json`` + ``*.safetensors`` (or torch ``*.bin``)
with `model.layers.{i}.self_attn.q_proj.weight`-style keys.

Torch stores linear weights ``[out, in]``; our pytree stores ``[in, out]``
and stacks the per-layer tensors on a leading layer axis (see
models/llama.py). Conversion is pure host-side numpy — nothing here touches
the TPU.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from llm_qat_tpu.models.config import LlamaConfig


# HF key templates -> (our path, transpose?)
_LAYER_KEYS = {
    "input_layernorm.weight": ("attn_norm", False),
    "self_attn.q_proj.weight": ("q", True),
    "self_attn.k_proj.weight": ("k", True),
    "self_attn.v_proj.weight": ("v", True),
    "self_attn.o_proj.weight": ("o", True),
    "post_attention_layernorm.weight": ("mlp_norm", False),
    "mlp.gate_proj.weight": ("gate", True),
    "mlp.up_proj.weight": ("up", True),
    "mlp.down_proj.weight": ("down", True),
}


def params_from_state_dict(
    sd: Dict[str, np.ndarray], config: LlamaConfig, dtype=jnp.bfloat16
):
    """Convert an HF LLaMA state dict (numpy values) to our stacked pytree."""
    L = config.num_hidden_layers
    layers = {}
    for hf_key, (ours, transpose) in _LAYER_KEYS.items():
        ws = []
        for i in range(L):
            w = sd[f"model.layers.{i}.{hf_key}"]
            ws.append(w.T if transpose else w)
        layers[ours] = jnp.asarray(np.stack(ws), dtype)

    params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "layers": layers,
        "final_norm": jnp.asarray(sd["model.norm.weight"], dtype),
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(sd["lm_head.weight"].T, dtype)
    return params


def state_dict_from_params(params, config: LlamaConfig) -> Dict[str, np.ndarray]:
    """Inverse of :func:`params_from_state_dict` — emits the latent fp
    weights in HF layout (the artifact the reference saves,
    utils/utils.py:39-49; the teacher is never part of ``params`` here so no
    key filtering is needed)."""
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"], np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
    }
    if not config.tie_word_embeddings:
        sd["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )
    for hf_key, (ours, transpose) in _LAYER_KEYS.items():
        stacked = np.asarray(params["layers"][ours], np.float32)
        for i in range(config.num_hidden_layers):
            w = stacked[i]
            # safetensors serializes the raw buffer; transposed views must be
            # materialized or the on-disk tensor silently keeps [in, out]
            sd[f"model.layers.{i}.{hf_key}"] = (
                np.ascontiguousarray(w.T) if transpose else w
            )
    return sd


def _load_raw_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read safetensors shards (preferred) or torch .bin shards into numpy."""
    st_files = sorted(
        f for f in os.listdir(path) if f.endswith(".safetensors")
    )
    sd: Dict[str, np.ndarray] = {}
    if st_files:
        from safetensors import safe_open

        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    bin_files = sorted(f for f in os.listdir(path) if f.endswith(".bin"))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin weights under {path}")
    import torch

    for fname in bin_files:
        part = torch.load(
            os.path.join(path, fname), map_location="cpu", weights_only=True
        )
        for k, v in part.items():
            sd[k] = v.float().numpy()
    return sd


def load_hf_checkpoint(
    path: str,
    dtype=jnp.bfloat16,
    **config_overrides,
) -> Tuple[LlamaConfig, dict]:
    """Load an HF LLaMA checkpoint directory into (config, params).

    ``config_overrides`` carries the quantization bit-widths, mirroring the
    reference's config injection (train.py:50-54)."""
    config = LlamaConfig.from_json(
        os.path.join(path, "config.json"), **config_overrides
    )
    sd = _load_raw_state_dict(path)
    if "lm_head.weight" not in sd and not config.tie_word_embeddings:
        config = config.replace(tie_word_embeddings=True)
    return config, params_from_state_dict(sd, config, dtype)


def save_hf_checkpoint(params, config: LlamaConfig, path: str) -> None:
    """Write params as an HF-format directory (config.json + safetensors)."""
    os.makedirs(path, exist_ok=True)
    sd = state_dict_from_params(params, config)
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(path, "model.safetensors"))
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "num_key_value_heads": config.kv_heads,
        "max_position_embeddings": config.max_position_embeddings,
        "rms_norm_eps": config.rms_norm_eps,
        "rope_theta": config.rope_theta,
        "tie_word_embeddings": config.tie_word_embeddings,
        "w_bits": config.w_bits,
        "a_bits": config.a_bits,
        "kv_bits": config.kv_bits,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=2)
