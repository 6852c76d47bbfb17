"""Fused quantized-KV decode attention — Pallas TPU kernel.

The serving decode step attends one new token per slot against the whole
int8 KV cache. The pure-XLA path (inference/model.py) dequantizes the full
cache to bf16 in HBM, applies RoPE to every cached key, and then attends —
~5 bytes of HBM traffic per cached element per layer per step. This kernel
reads the *int8* cache directly (1 byte/elem, the information floor),
dequantizes in VMEM, applies RoPE to keys in-kernel, and runs an online
softmax — nothing besides the int8 cache and the [b, nh, hd] query/output
ever touches HBM.

Cache layout is head-major — ``[b, kvh, S, hd]`` int8 with per-token
inverse scales ``[b, S]`` f32. Each grid program handles one (slot,
KV-block) pair across ALL kv heads — ``[kvh, bk, hd]`` per fetch — so DMAs
are hundreds of KB and the grid is only ``b * S/bk`` steps per layer (a
per-head grid was measured 60% slower than the XLA path from sheer grid
overhead). Per-slot lengths ride in scalar-prefetch SMEM: blocks past a
slot's length are clamped to the last valid block in the index map (Pallas
elides the refetch) and their compute is skipped, so a slot with 200
cached tokens costs ~200 tokens of traffic regardless of cache capacity.

Numerics contract (matches inference/model.py / the training hook,
modeling_llama_quant.py:320-333): K/V are quantized per-token pre-RoPE;
dequantize then RoPE by absolute cache position; fp32 softmax. The kernel
computes RoPE and scores in f32 (the XLA path's bf16 dequant is a strictly
looser rounding; parity is tolerance-tested in tests/test_decode_attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _decode_attn_kernel(
    # scalar prefetch
    lens_ref,                      # [b] int32 in SMEM
    # inputs
    q_ref,                         # [1, kvh, groups, hd]
    kq_ref,                        # [1, kvh, bk, hd] int8
    ks_ref,                        # [1, bk, 1] f32 (inverse scales)
    vq_ref,                        # [1, kvh, bk, hd] int8
    vs_ref,                        # [1, bk, 1] f32
    # outputs
    o_ref,                         # [1, kvh, groups, hd]
    # scratch
    m_ref,                         # [kvh, groups, 1] f32
    l_ref,                         # [kvh, groups, 1] f32
    acc_ref,                       # [kvh, groups, hd] f32
    *,
    bk: int,
    scale: float,
    theta: float,
    rope: bool = True,
):
    ib = pl.program_id(0)
    kb = pl.program_id(1)
    length = lens_ref[ib]
    n_valid = (length + bk - 1) // bk

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(kb < n_valid)
    def _():
        kvh, groups, hd = q_ref.shape[1:]
        h2 = hd // 2
        start = kb * bk
        ct = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

        ks = ks_ref[0]                                     # [bk, 1]
        kq = kq_ref[0]                                     # [kvh, bk, hd] i8
        k1 = kq[..., :h2].astype(ct)
        k2 = kq[..., h2:].astype(ct)
        if rope:
            pos = (
                start + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
            ).astype(jnp.float32)                          # [bk, 1]
            # RoPE tables (LlamaRotaryEmbedding: inv_freq = theta^(-2i/d))
            inv_freq = jnp.exp(
                jax.lax.broadcasted_iota(jnp.int32, (1, h2), 1).astype(
                    jnp.float32
                )
                * (-2.0 / hd)
                * jnp.log(jnp.float32(theta))
            )                                              # [1, hd/2]
            freqs = pos * inv_freq                         # [bk, hd/2]
            # fold the per-token inverse scale into the RoPE coefficients so
            # dequant + rotation is 4 mul + 2 add per element pair
            cc = (jnp.cos(freqs) * ks).astype(ct)[None]    # [1, bk, hd/2]
            ss = (jnp.sin(freqs) * ks).astype(ct)[None]
            # RoPE halves (x*cos + rotate_half(x)*sin, rotate_half =
            # [-x2, x1]); kept separate — the score matmul contracts each
            # half on its own, which skips a lane-concat relayout
            kr1 = k1 * cc - k2 * ss
            kr2 = k2 * cc + k1 * ss
        else:
            # post-RoPE cache (config.kv_cache_rope == "post"): integers are
            # already rotated; just dequantize
            ksb = ks.astype(ct)[None]                      # [1, bk, 1]
            kr1 = k1 * ksb
            kr2 = k2 * ksb
        v = vq_ref[0].astype(ct) * vs_ref[0][None].astype(ct)

        col = start + jax.lax.broadcasted_iota(jnp.int32, (groups, bk), 1)
        valid = col < length

        m_prev, l_prev = m_ref[:], l_ref[:]
        # per-kv-head MXU dots (unrolled; kvh is static)
        for h in range(kvh):
            q = q_ref[0, h].astype(ct)                     # [groups, hd]
            dn = (((1,), (1,)), ((), ()))
            s = jax.lax.dot_general(
                q[:, :h2], kr1[h], dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                q[:, h2:], kr2[h], dn, preferred_element_type=jnp.float32
            )                                              # [groups, bk]
            s = jnp.where(valid, s * scale, _NEG_INF)
            m_blk = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev[h], m_blk)
            alpha = jnp.exp(m_prev[h] - m_new)
            p = jnp.exp(s - m_new)
            m_ref[h] = m_new
            l_ref[h] = l_prev[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[h] = acc_ref[h] * alpha + jax.lax.dot_general(
                p.astype(ct), v[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kb == jnp.maximum(n_valid - 1, 0))
    def _():
        l = jnp.maximum(l_ref[:], 1e-9)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _pick_bk(S: int, kvh: int, hd: int, bk: int) -> int:
    """Cap the block so the f32 dequant working set stays VMEM-friendly
    (~4 MB for K+V), then round down to a divisor of S aligned to 8."""
    cap = max(2 ** 20 // (kvh * hd), 8)      # ~6 MB bf16+int8 working set
    bk = min(bk, cap, S)
    while S % bk or bk % 8:
        bk -= 8
        if bk <= 8:
            return 8
    return bk


@functools.partial(jax.jit, static_argnames=("bk", "theta", "rope"))
def quantized_decode_attention(
    q: jax.Array,        # [b, nh, hd] — post-RoPE query for the new token
    k_q: jax.Array,      # [b, kvh, S, hd] int8 (pre-RoPE values)
    k_s: jax.Array,      # [b, S] f32 per-token inverse scales
    v_q: jax.Array,      # [b, kvh, S, hd] int8
    v_s: jax.Array,      # [b, S] f32
    lengths: jax.Array,  # [b] int32 — positions < length attend
    *,
    theta: float = 10000.0,
    bk: int = 1024,
    rope: bool = True,   # False => cache already holds rotated K (post mode)
) -> jax.Array:          # [b, nh, hd]
    b, nh, hd = q.shape
    kvh, S = k_q.shape[1], k_q.shape[2]
    groups = nh // kvh
    assert nh == kvh * groups, (q.shape, k_q.shape)
    bk = _pick_bk(S, kvh, hd, bk)
    scale = 1.0 / (hd ** 0.5)

    def clamp(kb, length):
        nv = jnp.maximum((length + bk - 1) // bk, 1)
        return jnp.minimum(kb, nv - 1)

    grid = (b, S // bk)
    out = pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, bk=bk, scale=scale, theta=float(theta),
            rope=rope,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, kvh, groups, hd), lambda ib, kb, lens: (ib, 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, kvh, bk, hd),
                    lambda ib, kb, lens: (ib, 0, clamp(kb, lens[ib]), 0),
                ),
                pl.BlockSpec(
                    (1, bk, 1),
                    lambda ib, kb, lens: (ib, clamp(kb, lens[ib]), 0),
                ),
                pl.BlockSpec(
                    (1, kvh, bk, hd),
                    lambda ib, kb, lens: (ib, 0, clamp(kb, lens[ib]), 0),
                ),
                pl.BlockSpec(
                    (1, bk, 1),
                    lambda ib, kb, lens: (ib, clamp(kb, lens[ib]), 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, kvh, groups, hd), lambda ib, kb, lens: (ib, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, groups, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        lengths,
        q.reshape(b, kvh, groups, hd),
        k_q,
        k_s[..., None],
        v_q,
        v_s[..., None],
    )
    return out.reshape(b, nh, hd)


def _paged_attn_kernel(lens_ref, bt_ref, *rest, **kw):
    # block-table indirection happens entirely in the index maps; the body
    # only needs lengths
    _decode_attn_kernel(lens_ref, *rest, **kw)


@functools.partial(jax.jit, static_argnames=("theta", "rope"))
def quantized_paged_attention(
    q: jax.Array,             # [b, nh, hd] — post-RoPE query
    k_q: jax.Array,           # [n_pages, kvh, P, hd] int8 pool (pre-RoPE)
    k_s: jax.Array,           # [n_pages, P] f32 per-token inverse scales
    v_q: jax.Array,           # [n_pages, kvh, P, hd] int8
    v_s: jax.Array,           # [n_pages, P] f32
    lengths: jax.Array,       # [b] int32
    block_tables: jax.Array,  # [b, max_pages] int32 — logical page -> pool id
    *,
    theta: float = 10000.0,
    rope: bool = True,
) -> jax.Array:               # [b, nh, hd]
    """Paged-attention analog of `quantized_decode_attention`: the grid's KV
    dimension walks each slot's block table (scalar-prefetched), so pages
    stream from the shared pool with no gather materialization. Logical
    position of page ``pg`` row ``j`` is ``pg*P + j`` (RoPE + causal mask use
    logical positions); pages past ``ceil(len/P)`` are clamped in the index
    map and skipped."""
    b, nh, hd = q.shape
    n_pages, kvh, P, _ = k_q.shape
    max_pages = block_tables.shape[1]
    groups = nh // kvh
    assert nh == kvh * groups, (q.shape, k_q.shape)
    scale = 1.0 / (hd ** 0.5)

    def page_of(ib, pg, lens, bt):
        # SMEM allows scalar loads only (real-TPU lowering rule): index the
        # block table at [ib, pg'] directly rather than slicing row ib
        nv = jnp.maximum((lens[ib] + P - 1) // P, 1)
        return bt[ib, jnp.minimum(pg, nv - 1)]

    grid = (b, max_pages)
    out = pl.pallas_call(
        functools.partial(
            _paged_attn_kernel, bk=P, scale=scale, theta=float(theta),
            rope=rope,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, kvh, groups, hd),
                    lambda ib, pg, lens, bt: (ib, 0, 0, 0),
                ),
                pl.BlockSpec(
                    (1, kvh, P, hd),
                    lambda ib, pg, lens, bt: (
                        page_of(ib, pg, lens, bt), 0, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, P, 1),
                    lambda ib, pg, lens, bt: (
                        page_of(ib, pg, lens, bt), 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, kvh, P, hd),
                    lambda ib, pg, lens, bt: (
                        page_of(ib, pg, lens, bt), 0, 0, 0
                    ),
                ),
                pl.BlockSpec(
                    (1, P, 1),
                    lambda ib, pg, lens, bt: (
                        page_of(ib, pg, lens, bt), 0, 0
                    ),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, kvh, groups, hd), lambda ib, pg, lens, bt: (ib, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, 1), jnp.float32),
                pltpu.VMEM((kvh, groups, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, groups, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(
        lengths,
        block_tables,
        q.reshape(b, kvh, groups, hd),
        k_q,
        k_s[..., None],
        v_q,
        v_s[..., None],
    )
    return out.reshape(b, nh, hd)


def decode_attention_reference(
    q, k_q, k_s, v_q, v_s, lengths, *, theta: float = 10000.0
) -> jax.Array:
    """Pure-XLA oracle with identical semantics (f32 throughout), for tests."""
    b, nh, hd = q.shape
    kvh, S = k_q.shape[1], k_q.shape[2]
    groups = nh // kvh

    kd = k_q.astype(jnp.float32) * k_s[:, None, :, None]   # [b, kvh, S, hd]
    vd = v_q.astype(jnp.float32) * v_s[:, None, :, None]

    pos = jnp.arange(S, dtype=jnp.float32)
    inv_freq = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = pos[:, None] * inv_freq[None, :]               # [S, hd/2]
    cos = jnp.concatenate([jnp.cos(freqs)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(freqs)] * 2, axis=-1)
    k1, k2 = kd[..., : hd // 2], kd[..., hd // 2 :]
    rot = jnp.concatenate([-k2, k1], axis=-1)
    kd = kd * cos[None, None] + rot * sin[None, None]

    qg = q.reshape(b, kvh, groups, hd).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, kd) / (hd ** 0.5)
    valid = jnp.arange(S)[None, :] < lengths[:, None]      # [b, S]
    s = jnp.where(valid[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p, vd)
    return out.reshape(b, nh, hd).astype(q.dtype)
