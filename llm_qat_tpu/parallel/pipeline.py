"""Pipeline parallelism (GPipe-style) over a ``pp`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.3 lists it as
absent; its vestigial ``device_map="auto"`` layer placement is replaced by
sharding here). This module adds it the TPU way rather than with torch's
per-rank module partitioning:

  * the model's stacked layer axis ``[L, ...]`` (models/llama.py) shards
    over ``pp`` — stage ``p`` holds layers ``[p*L/P, (p+1)*L/P)`` with NO
    parameter layout change;
  * the schedule is a single SPMD program under ``shard_map``: a
    ``lax.scan`` over ``M + P - 1`` ticks where every stage applies its
    local layers to its current activation and rotates it to the next
    stage with ``lax.ppermute`` (ICI ring traffic only);
  * stage 0 ingests a new microbatch each tick, the last stage banks its
    finished microbatch; bubble ticks compute on zeros and their results
    are never stored;
  * reverse-mode AD through the scan + ppermute yields the reverse
    pipeline schedule automatically — ``jax.grad`` of `pipeline_lm_loss`
    is the pipelined backward, no hand-written bwd schedule.

Composes with the existing axes: the microbatch dim can additionally be
sharded over ``data`` (the specs here keep that dimension unsharded for
clarity; `mesh.batch_spec` handles the data axis in the FSDP path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig

Params = Dict[str, Any]


def pipeline_param_specs(tie_word_embeddings: bool = False) -> Params:
    """PartitionSpec pytree: stacked layer weights shard their leading
    (layer) axis over ``pp``; everything else is replicated."""
    specs = {
        "embed": P(),
        "layers": {
            "attn_norm": P("pp"),
            "q": P("pp"),
            "k": P("pp"),
            "v": P("pp"),
            "o": P("pp"),
            "mlp_norm": P("pp"),
            "gate": P("pp"),
            "up": P("pp"),
            "down": P("pp"),
        },
        "final_norm": P(),
    }
    if not tie_word_embeddings:
        specs["lm_head"] = P()
    return specs


def shard_params_pp(params: Params, mesh: Mesh) -> Params:
    specs = pipeline_param_specs("lm_head" not in params)
    return jax.device_put(
        params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        ),
    )


def _stage_sweep(
    layers_local: Params,
    h: jax.Array,
    config: LlamaConfig,
    mask: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    use_flash: bool,
    remat: bool,
) -> jax.Array:
    """Apply this stage's local layers (an inner scan, like backbone's)."""

    def body(h, lp):
        out, _ = llama.decoder_layer(
            h, lp, config, mask, cos, sin, use_flash=use_flash
        )
        return out, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    h, _ = lax.scan(body, h, layers_local)
    return h


def pipeline_backbone(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,  # [b, s]
    mesh: Mesh,
    *,
    num_microbatches: int,
    remat: bool = False,
    dtype=None,
) -> jax.Array:
    """Pipelined decoder sweep -> final hidden states ``[b, s, H]``
    (replicated across stages, like `models.llama.backbone`).

    Requirements: ``L % P == 0`` and ``b % num_microbatches == 0``.
    """
    c = config
    Pn = mesh.shape["pp"]
    M = num_microbatches
    b, s = input_ids.shape
    if b % M:
        raise ValueError(f"batch {b} not divisible by microbatches {M}")
    if c.num_hidden_layers % Pn:
        raise ValueError(
            f"layers {c.num_hidden_layers} not divisible by pp={Pn}"
        )
    mbs = b // M
    use_flash = c.use_flash_attention and s % min(128, s) == 0 and s >= 16

    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (mbs, s))
    cos, sin = llama.rope_cos_sin(positions, c.head_dim, c.rope_theta)
    mask = (
        jnp.zeros((mbs, 1, 1, 1), jnp.float32)
        if use_flash
        else llama.causal_mask(mbs, s, None, dtype=jnp.float32)
    )

    layer_specs = pipeline_param_specs()["layers"]

    def shard_fn(layers_local, embed, ids):
        p = lax.axis_index("pp")
        is_last = p == Pn - 1
        mb_ids = ids.reshape(M, mbs, s)

        h0 = jnp.zeros(
            (mbs, s, c.hidden_size),
            dtype if dtype is not None else embed.dtype,
        )
        out0 = jnp.zeros((M, mbs, s, c.hidden_size), h0.dtype)

        def tick(carry, t):
            h_cur, outputs = carry
            # stage 0 ingests microbatch t (clamped; bubble ticks re-read
            # the last one and their results are never banked)
            t_in = jnp.clip(t, 0, M - 1)
            ids_t = lax.dynamic_index_in_dim(mb_ids, t_in, 0, keepdims=False)
            x0 = jnp.take(embed, ids_t, axis=0).astype(h0.dtype)
            h_in = jnp.where(p == 0, x0, h_cur)

            h_out = _stage_sweep(
                layers_local, h_in, c, mask, cos, sin, use_flash, remat
            )

            # last stage banks microbatch t-(P-1); bubble writes land on a
            # clamped index and are overwritten by the real one later
            t_out = jnp.clip(t - (Pn - 1), 0, M - 1)
            banked = lax.dynamic_update_index_in_dim(
                outputs, h_out.astype(outputs.dtype), t_out, 0
            )
            take = jnp.logical_and(is_last, t >= Pn - 1)
            outputs = jnp.where(take, banked, outputs)

            # rotate activations one stage forward (ring over ICI)
            h_next = lax.ppermute(
                h_out, "pp", [(i, (i + 1) % Pn) for i in range(Pn)]
            )
            return (h_next, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (h0, out0), jnp.arange(M + Pn - 1)
        )
        # replicate the last stage's result to every stage
        outputs = lax.psum(jnp.where(is_last, outputs, 0.0), "pp")
        return outputs

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(layer_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )(params["layers"], params["embed"], input_ids)
    return out.reshape(b, s, c.hidden_size)


def pipeline_forward(
    params: Params,
    config: LlamaConfig,
    input_ids: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
    remat: bool = False,
    dtype=None,
) -> jax.Array:
    """Pipelined causal-LM forward -> fp32 logits ``[b, s, vocab]``
    (numerics match `models.llama.forward` — same layers, same order)."""
    h = pipeline_backbone(
        params, config, input_ids, mesh,
        num_microbatches=num_microbatches, remat=remat, dtype=dtype,
    )
    return llama._logits(params, config, h)


def pipeline_lm_loss(
    params: Params,
    config: LlamaConfig,
    batch: Dict[str, jax.Array],
    mesh: Mesh,
    *,
    num_microbatches: int,
    remat: bool = False,
    dtype=None,
) -> jax.Array:
    """Shifted next-token CE through the pipeline; ``jax.grad`` of this is
    the pipelined backward (reverse schedule derived by AD)."""
    logits = pipeline_forward(
        params, config, batch["input_ids"], mesh,
        num_microbatches=num_microbatches, remat=remat, dtype=dtype,
    )
    return llama.causal_lm_loss(logits, batch["labels"])
