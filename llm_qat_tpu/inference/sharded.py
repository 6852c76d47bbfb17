"""Tensor-parallel serving: the true-int engine over a device mesh.

The reference has no serving at all (SURVEY.md §1 "no serving layer"); the
north star asks for a quantized inference engine whose KV cache is
"tensor-sharded over ICI" with "collectives overlapped with dequant+matmul
compute". This module provides that as a thin sharding layer over the
single-device serving forward (inference/model.py):

  * **Megatron column/row pair.** The fused qkv and gate-up projections are
    column-sharded over the ``tp`` axis (each device owns a contiguous block
    of attention heads / ffn channels); o and down are row-sharded and psum.
    The psum is chunked over the output dim (quantized.quant_linear
    ``n_chunks``) so the all-reduce of chunk i rides ICI while chunk i+1's
    dequant+matmul occupies the MXU.
  * **KV cache sharded over kv heads** (``[L, b, kvh, hd, S]`` int8 carries
    ``P(None, None, 'tp', None, None)``): each device's fused decode-attention
    kernel streams only its local heads' int8 blocks; attention needs no
    collective at all (softmax is per-head). Per-token scales are replicated
    — they are computed from the pmax of the local absmax, so the sharded
    cache holds *exactly* the single-device integers. KV4 nibble packing
    (config.kv_cache_pack) composes: packing is split-half per head, so the
    shard-local pack equals the global pack sliced by head.
  * **Exact activation scales.** Row-parallel inputs are only a K-shard, so
    the per-token activation absmax is pmax'd before quantizing — sharded
    int numerics are bit-identical to single-device; only the final f32
    partial-sum addition order differs (tolerance-tested).
  * **TP-interleaved fused weights.** The fused qkv/gateup concat is laid
    out per-device ``[q_d | k_d | v_d]`` so a plain contiguous N-shard hands
    every device its own heads; int4 row-parallel weights are packed
    *per K-shard* so each device's nibbles unpack locally (packing order
    cannot change results — integer accumulation is exact).

Multi-host serving composes data-over-hosts x tp-within-host: each host runs
its own continuous-batching engine (inference/engine.py) against a
tp-sharded model over its local chips; requests are partitioned across hosts
by the frontend. There is no cross-host collective on the serving hot path
by construction.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops.pallas import quant_matmul as QM

_COL_GROUPS = {"qkv": ("q", "k", "v"), "gateup": ("gate", "up")}
_ROW_SINGLES = ("o", "down")


def _interleave_tp(parts, tp: int) -> jax.Array:
    """Fuse ``[L, K, N_i]`` weights as per-device blocks
    ``[p0_d0 | p1_d0 | ... | p0_d1 | ...]`` so a contiguous N-shard over tp
    gives device d exactly its own slice of every part."""
    chunks = [w.reshape(*w.shape[:-1], tp, w.shape[-1] // tp) for w in parts]
    per_dev = [
        jnp.concatenate([c[..., d, :] for c in chunks], axis=-1)
        for d in range(tp)
    ]
    return jnp.concatenate(per_dev, axis=-1)


def _pack_int4_rowsharded(q8: jax.Array, tp: int) -> jax.Array:
    """[L, K, N] int8 -> [L, K/2, N] uint8, split-half packed *within each
    K/tp shard* — device d's packed rows unpack from its own shard alone
    (matches QM.pack_int4 exactly when tp == 1)."""
    L, K, N = q8.shape
    kl = K // tp
    assert kl % 2 == 0, (K, tp)
    q8 = q8.reshape(L, tp, kl, N)
    kh = kl // 2
    lo = q8[:, :, :kh].astype(jnp.uint8) & 0xF
    hi = q8[:, :, kh:].astype(jnp.uint8) & 0xF
    return ((hi << 4) | lo).astype(jnp.uint8).reshape(L, K // 2, N)


def quantize_params_tp(
    params: Dict[str, Any], config: LlamaConfig, tp: int
) -> Dict[str, Any]:
    """Latent-fp pytree -> serving pytree in tp-interleaved layout.

    ``tp=1`` produces exactly ``quantized.quantize_params``'s layout. Scales
    are always computed over the *full* K per output channel (quantization
    happens before sharding), so tp changes layout, never numerics.
    Requires tp to divide num_attention_heads, kv_heads, intermediate_size,
    and the row-parallel K-shards to be even (int4 packing)."""
    c = config
    w_bits = c.w_bits
    if w_bits not in (4, 8, 16, 32):
        raise NotImplementedError(f"serving w_bits {w_bits}")
    if c.num_attention_heads % tp or c.kv_heads % tp or c.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} must divide heads ({c.num_attention_heads}), kv heads "
            f"({c.kv_heads}) and ffn ({c.intermediate_size})"
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

    def quantize_col(w):
        if w_bits >= 16:
            return {"w": w}
        if w_bits == 8:
            q, s = jax.vmap(lambda wl: QM.quantize_per_channel(wl, 8))(w)
            return {"q": q, "s": s}
        q, s = jax.vmap(lambda wl: QM.quantize_per_channel(wl, 4))(w)
        # column-parallel: K unsharded, global split-half pack
        return {"q": jax.vmap(QM.pack_int4)(q), "s": s}

    def quantize_row(w):
        if w_bits >= 16:
            return {"w": w}
        if w_bits == 8:
            q, s = jax.vmap(lambda wl: QM.quantize_per_channel(wl, 8))(w)
            return {"q": q, "s": s}
        q, s = jax.vmap(lambda wl: QM.quantize_per_channel(wl, 4))(w)
        return {"q": _pack_int4_rowsharded(q, tp), "s": s}

    for name, parts in _COL_GROUPS.items():
        w = _interleave_tp([params["layers"][k] for k in parts], tp)
        out["layers"][name] = quantize_col(w)
    for key in _ROW_SINGLES:
        out["layers"][key] = quantize_row(params["layers"][key])
    return out


# ---------------------------------------------------------------------------
# Sharding specs
# ---------------------------------------------------------------------------


def _wspec(qw: Dict[str, Any], col: bool, axis: str):
    """Spec for one projection's {"q","s"} / {"w"} dict."""
    if "w" in qw:
        return {"w": P(None, axis, None) if not col else P(None, None, axis)}
    if col:
        return {"q": P(None, None, axis), "s": P(None, None, axis)}
    # row-parallel: K (packed or not) sharded, per-channel scales replicated
    return {"q": P(None, axis, None), "s": P(None, None, None)}


def qparam_specs(qparams: Dict[str, Any], axis: str = "tp") -> Dict[str, Any]:
    """PartitionSpec tree for a ``quantize_params_tp`` pytree."""
    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": {
            "attn_norm": P(None, None),
            "mlp_norm": P(None, None),
            "qkv": _wspec(qparams["layers"]["qkv"], True, axis),
            "gateup": _wspec(qparams["layers"]["gateup"], True, axis),
            "o": _wspec(qparams["layers"]["o"], False, axis),
            "down": _wspec(qparams["layers"]["down"], False, axis),
        },
    }
    if "lm_head" in qparams:
        specs["lm_head"] = P(None, axis)  # vocab-sharded; logits all-gathered
    return specs


def cache_specs(axis: str = "tp") -> Dict[str, P]:
    """KV cache: int8 values sharded over kv heads, scales/lengths replicated
    (scales are per-token, shared by all heads)."""
    kv = P(None, None, axis, None, None)
    return {
        "k_q": kv, "k_s": P(None, None, None),
        "v_q": kv, "v_s": P(None, None, None),
        "lengths": P(None),
    }


def place(tree, mesh: Mesh, specs):
    """device_put a pytree onto the mesh with the given PartitionSpecs."""
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(tree, shardings)


# ---------------------------------------------------------------------------
# The tensor-parallel forward
# ---------------------------------------------------------------------------


def make_tp_forward(
    config: LlamaConfig,
    mesh: Mesh,
    qparams: Dict[str, Any],
    dtype=jnp.bfloat16,
    axis: str = "tp",
    from_empty: bool = False,
):
    """Jitted tensor-parallel serving step with `serving_forward`'s
    signature minus config/dtype: ``fn(qparams, ids, seq_lens, active,
    cache) -> (logits, cache)``.

    ``qparams`` is only inspected for its structure (quantized vs fp
    projections) to build the specs; pass the same tree (or any tree of the
    same structure) at call time. ``from_empty`` builds the prefill variant
    (flash over fresh fake-quant KV; see model._serving_layer)."""
    qspecs = qparam_specs(qparams, axis)
    cspecs = cache_specs(axis)
    rep = P()

    local = functools.partial(
        M._forward, config=config, dtype=dtype, tp_axis=axis,
        from_empty=from_empty,
    )

    def fn(qp, ids, seq_lens, active, cache):
        return local(qp, input_ids=ids, seq_lens=seq_lens, active=active,
                     cache=cache)

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(qspecs, rep, rep, rep, cspecs),
        out_specs=(rep, cspecs),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_tp_prefill(
    config: LlamaConfig,
    mesh: Mesh,
    qparams: Dict[str, Any],
    dtype=jnp.bfloat16,
    axis: str = "tp",
):
    """Jitted tensor-parallel batch-1 slot prefill (model.prefill_slot over
    the mesh): ``fn(qparams, ids[1, s]) -> (logits, rows)``, rows sharded
    over kv heads exactly like the persistent cache so `model.insert_slot`
    splices them in without resharding."""
    qspecs = qparam_specs(qparams, axis)
    rep = P()
    tp = mesh.shape[axis]
    c = config
    rows_specs = cache_specs(axis)

    def fn(qp, ids):
        b, s = ids.shape
        kvh_local = c.kv_heads // tp
        packed = M.cache_is_packed(c)
        hd = c.head_dim // 2 if packed else c.head_dim
        qdt = jnp.uint8 if packed else jnp.int8
        kv_shape = (c.num_hidden_layers, b, kvh_local, hd, s)
        cache = {
            "k_q": jnp.zeros(kv_shape, qdt),
            "k_s": jnp.ones((c.num_hidden_layers, b, s), jnp.float32),
            "v_q": jnp.zeros(kv_shape, qdt),
            "v_s": jnp.ones((c.num_hidden_layers, b, s), jnp.float32),
            "lengths": jnp.zeros((b,), jnp.int32),
        }
        return M._forward(
            qp, c, ids, jnp.zeros((b,), jnp.int32), jnp.ones((b,), bool),
            cache, dtype, tp_axis=axis, from_empty=True,
        )

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(qspecs, rep),
        out_specs=(rep, rows_specs),
        check_vma=False,
    )
    return jax.jit(sharded)


def init_serving_cache_tp(
    config: LlamaConfig, batch: int, max_len: int, mesh: Mesh,
    axis: str = "tp",
) -> Dict[str, jax.Array]:
    """Mesh-sharded serving cache (global shapes identical to the
    single-device cache, including the KV4 nibble-packed container when
    ``config.kv_cache_pack`` — packing is per-head, so the head-sharded
    packed cache holds exactly the single-device bytes)."""
    cache = M.init_serving_cache(config, batch, max_len)
    return place(cache, mesh, cache_specs(axis))


# ---------------------------------------------------------------------------
# Paged tensor-parallel serving (inference/paged.py over the mesh)
# ---------------------------------------------------------------------------


def paged_cache_specs(axis: str = "tp") -> Dict[str, P]:
    """Paged KV pool: int8 pages sharded over kv heads
    (``[L, n_pages, kvh, hd, P]``, both K and V transposed), per-token
    scales replicated."""
    kv = P(None, None, axis, None, None)
    return {
        "k_q": kv, "k_s": P(None, None, None),
        "v_q": kv, "v_s": P(None, None, None),
    }


def init_paged_cache_tp(
    config: LlamaConfig, pcfg, mesh: Mesh, axis: str = "tp",
) -> Dict[str, jax.Array]:
    """Mesh-sharded page pool (global shapes identical to single-device)."""
    from llm_qat_tpu.inference import paged as PG

    cache = PG.init_paged_cache(config, pcfg)
    return place(cache, mesh, paged_cache_specs(axis))


def make_tp_paged_forward(
    config: LlamaConfig,
    pcfg,
    mesh: Mesh,
    qparams: Dict[str, Any],
    dtype=jnp.bfloat16,
    axis: str = "tp",
    from_empty: bool = False,
):
    """Jitted tensor-parallel paged serving step: ``fn(qparams, ids,
    seq_lens, active, block_tables, cache) -> (logits, cache)``. Same
    sharding scheme as `make_tp_forward`; block tables and lengths are
    host-managed and replicated. ``from_empty`` builds the prefill variant
    (flash over fresh fake-quant KV; call with ``b == 1`` rows)."""
    from llm_qat_tpu.inference import paged as PG

    qspecs = qparam_specs(qparams, axis)
    cspecs = paged_cache_specs(axis)
    rep = P()

    local = functools.partial(
        PG._forward, config=config, pcfg=pcfg, dtype=dtype, tp_axis=axis,
        from_empty=from_empty,
    )

    def fn(qp, ids, seq_lens, active, block_tables, cache):
        return local(qp, input_ids=ids, seq_lens=seq_lens, active=active,
                     block_tables=block_tables, cache=cache)

    sharded = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(qspecs, rep, rep, rep, rep, cspecs),
        out_specs=(rep, cspecs),
        check_vma=False,
    )
    return jax.jit(sharded)
