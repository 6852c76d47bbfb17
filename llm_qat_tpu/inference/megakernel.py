"""Whole-model decode megakernel: one ``pallas_call`` for all L layers.

DESIGN.md "Decode speed-of-light study" (round 1-2): the scan path's decode
step measures ~19% of the weight+KV HBM floor because XLA materializes an
HBM copy of every per-layer slice that feeds a Pallas custom call (~44 MB of
weights + ~8.5 MB of cache per layer per step), and the scalar-prefetch
stacked-kernel variants serialize their DMAs behind scalar-dependent index
maps. This kernel removes the structural problem: the grid is ``(L,)`` over
layers, every weight/cache tensor stays in HBM (``memory_space=ANY``, no
BlockSpec slicing), and the kernel streams them itself with double-buffered
``make_async_copy`` DMAs — layer ``l+1``'s first weight chunks are in
flight while layer ``l``'s MLP still computes, so the DMA engine never
drains across layer boundaries and nothing is copied HBM->HBM.

Numerics mirror the scan path (inference/model.py::_serving_layer at s=1)
op for op:
  * per-token int8 activation quant (+1e-6 epsilons) -> int8 MXU dot ->
    ``acc / ((sx+eps)(sw+eps))`` fixup — the same exact-int32 math as
    quant_matmul.int8_matmul / int8_matmul_xla;
  * K/V quantized per-token (pre-RoPE hook, modeling_llama_quant.py:
    320-333); the kernel RETURNS each layer's integers + inverse scales
    and the caller commits them with vmapped dynamic_update_slice into the
    cache (one small write per step — per-slot column DMAs from inside
    the kernel don't meet Mosaic's DMA tiling rules);
  * attention = decode_attention's online softmax over the streamed int
    cache (K AND V in BK-column chunks off the shared transposed
    [.., hd, S] layout — round 4 flipped V to match K, which deleted the
    per-step XLA V-transpose copy of the whole cache the kernel used to
    pay, ~92 MB/step at the flagship shape), current token folded as a
    final pair (active slots);
  * KV4 nibble-packed caches (model.cache_is_packed) stream packed: the
    byte's nibbles are the split-half hd rows — exactly the two halves
    RoPE's rotate-half wants — so unpack is two shifts fused into the
    dequant, and cache DMA bytes halve;
  * residual stream carried in VMEM scratch across the grid, fp32-accum
    RMSNorm, hoisted RoPE tables.

Mosaic shape discipline (learned the hard way, kept for posterity): no
vector reshapes that split/merge the lane dim, no concats of slices with
mismatched sublane offsets, no dynamic/odd sublane indices — everything is
2-D values + leading-dim indexed refs, with unit dims materialized in the
operand layouts ([L, 1, H] norms, [L, b, 1, S] scales, [nb, hd/2, BK]
tables).

Supported: w_bits in {4, 8} (int4 weights stream packed and unpack
in-kernel), 2<a_bits<=8, int8 or KV4 nibble-packed caches, b <= 32,
NC | {Dq, H, 2I}, BK | S. Other configs fall back to the scan path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig

_EPS = 1e-6      # reference epsilon (utils_quant.py:71-72)
_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def supported(config: LlamaConfig, b: int, max_len: int) -> bool:
    c = config
    if c.w_bits not in (4, 8) or not (2 < c.a_bits <= 8):
        return False
    if b > 32:
        return False
    nc, bk, kh = _pick_nc_bk(c, b, max_len)
    dq = c.hidden_size + 2 * c.kv_heads * c.head_dim
    if nc < 128 and not _interpret():
        return False
    if c.hidden_size % nc or dq % nc or (2 * c.intermediate_size) % nc:
        return False
    if c.hidden_size // nc < 2:
        return False
    if max_len % bk:
        return False
    # the double-buffered weight + cache + scratch VMEM must fit Mosaic's
    # 16 MB scoped-vmem budget — configs that can't fit even at the
    # BK/KH/NC floors serve via the scan path instead of failing a long
    # Mosaic compile
    if _vmem_estimate(c, b, max_len, nc, bk, kh) > _budget(c, kh):
        return False
    return True


# Mosaic's scoped-vmem hard limit is 16 MiB; the estimate below overshoots
# real usage by ~1 MiB at measured GQA shapes, so budget slightly under.
_VMEM_BUDGET = 15_500_000
# At UNBATCHED-softmax MHA-scale shapes (groups < 8, many kv heads) the
# compiler allocates ~2.5 MiB more than the model (7B W8A8KV8 b=8 KH=2
# NC=256: estimate 15.2M, Mosaic 17.75M — the per-head loop's tile padding
# is under-modeled), so that class budgets stricter and the picker shrinks
# KH/NC until the real allocation fits.
_VMEM_BUDGET_UNBATCHED_MHA = 12_800_000


def _budget(c: LlamaConfig, kh: int = 0) -> int:
    # the per-head path's tile padding is under-modeled at MHA scale in
    # BOTH attention modes (rep-batched KH=16 at 7B: estimate 12.95M,
    # Mosaic 16.86M), so the whole shape class budgets stricter and the
    # picker shrinks KH until the real allocation fits
    del kh
    groups = c.num_attention_heads // c.kv_heads
    if groups < 8 and c.kv_heads >= 16:
        return _VMEM_BUDGET_UNBATCHED_MHA
    return _VMEM_BUDGET


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _vmem_estimate(c: LlamaConfig, b: int, max_len: int, nc: int, bk: int,
                   kh: int = 0) -> int:
    """Bytes of scoped VMEM the kernel will ask Mosaic for at chunk width
    ``nc``, KV block ``bk`` and KV-head tile ``kh`` (0 = all heads):
    double-buffered weight chunks + double-buffered KV cache blocks + the
    activation/softmax scratch (WITH Mosaic's (8, 128) tile padding — the
    per-head [groups=1, hd] tiles at MHA pad 8x on the sublane dim, +4 MB
    at 7B shapes, measured against the compiler's own 18.23M report) and
    in-VMEM rope tables."""
    H, I = c.hidden_size, c.intermediate_size
    nh, kvh, hd = c.num_attention_heads, c.kv_heads, c.head_dim
    groups = nh // kvh
    kh = kh or kvh
    dq = H + 2 * kvh * hd
    wdiv = 2 if c.w_bits == 4 else 1
    west = 2 * (H // wdiv) * nc + 2 * (I // wdiv) * nc
    hdc = hd // 2 if (c.kv_cache_pack and c.kv_bits <= 4) else hd
    kvbufs = 2 * 2 * b * kh * hdc * bk + 2 * 2 * b * bk * 4  # +k/v scales
    bm = max(32, -(-b // 8) * 8)
    rep = 8 if (groups == 1 and kh % 8 == 0) else 1
    batched = (groups % 8 == 0 and kvh > 1) or rep > 1
    if batched:
        ge = groups * rep
        nt = max(kvh // kh, 1)
        ml = 2 * b * nt * _pad8(kh * ge) * 128 * 4
        accq4 = (b * nt * _pad8(kh * ge) + b * _pad8(nh)) * _pad128(hd) * 4
    else:
        ml = 2 * b * kvh * _pad8(groups) * 128 * 4
        accq4 = 2 * b * kvh * _pad8(groups) * _pad128(hd) * 4
    scratch = (
        b * (2 * H + dq + 2 * I) * 2      # h, attn, qkv, gu (bf16)
        + bm * max(H, I)                  # int8 activation buffer
        + b * nh * hd * 4                 # qrot (f32)
        + ml + accq4                      # m/l + acc/q4 (tile-padded f32)
        + nh * bk * 4                     # score scratch
        + 2 * max_len * (hd // 2) * 4     # kcos/ksin cache rope tables
    )
    return west + kvbufs + scratch


def _pick_nc_bk(c: LlamaConfig, b: int, max_len: int) -> Tuple[int, int, int]:
    """Jointly choose the weight-chunk width NC, KV block BK, and KV-head
    tile KH so the kernel's scoped VMEM fits Mosaic's budget.

    NC: explicit override honored when it divides every stage width and
    fits (else warn + auto); auto = largest power of two <= 256 dividing
    {Dq, H, 2I}. BK: explicit override honored when it divides max_len;
    auto = 512 halved (floor 128 — smaller minor dims hit Mosaic's
    lane-padded-DMA rejections) until the estimate fits. KH: the cache
    streams in KH-head tiles — halving KH halves the KV double-buffers
    (the lever that fits MHA shapes: 7B kvh=32 at BK=128 needs 8.4 MB of
    full-head KV buffers and measured 18.23 M total, VERDICT r4 next #1).
    Finally NC drops toward 128 if still over."""
    import math

    dq = c.hidden_size + 2 * c.kv_heads * c.head_dim
    g = math.gcd(math.gcd(c.hidden_size, dq), 2 * c.intermediate_size)
    kvh = c.kv_heads
    groups = c.num_attention_heads // kvh
    batched = groups % 8 == 0 and kvh > 1

    def auto_nc() -> int:
        nc = 256
        while nc > g or g % nc:
            nc //= 2
            if nc == 0:
                return g
        # the down stage needs >= 2 chunks (its double buffer primes the
        # next layer's pipeline)
        while nc > 1 and c.hidden_size // nc < 2 and nc % 2 == 0:
            nc //= 2
        return nc

    def kh_ok(kh: int) -> bool:
        # batched softmax slices land at multiples of kh*groups — keep
        # per-tile sublane offsets 8-aligned
        return not batched or (kh * groups) % 8 == 0

    def auto_bk_kh(nc: int) -> Tuple[int, int]:
        bk = (
            c.megakernel_bk
            if c.megakernel_bk and max_len % c.megakernel_bk == 0
            else 512
        )
        while max_len % bk:
            bk //= 2
        kh = kvh
        if not c.megakernel_bk:
            while bk > 128 and _vmem_estimate(c, b, max_len, nc, bk, kh) > _budget(c, kh):
                bk //= 2
        while (
            _vmem_estimate(c, b, max_len, nc, bk, kh) > _budget(c, kh)
            and kh % 2 == 0 and kh > 1 and kh_ok(kh // 2)
        ):
            kh //= 2
        return max(bk, 1), kh

    if c.megakernel_nc:
        # explicit override (config.megakernel_nc): honored when it
        # divides every stage width AND the full VMEM estimate (weights +
        # cache double-buffers + scratch + rope tables) leaves headroom
        # under Mosaic's 16 MB scoped-vmem limit (measured: b=16 W8 at
        # NC=512/BK=512 exceeds it by 1.16 MB; BK=256 fits), else WARN
        # and fall through to auto — a silently dropped override would
        # make benchmarks report auto-NC numbers as if it applied
        nc = c.megakernel_nc
        bk, kh = auto_bk_kh(nc)
        if (g % nc == 0 and c.hidden_size // nc >= 2
                and _vmem_estimate(c, b, max_len, nc, bk, kh) <= _budget(c, kh)):
            return nc, bk, kh
        import warnings
        warnings.warn(
            f"megakernel_nc={nc} rejected for b={b}, max_len={max_len} "
            f"(divisibility or VMEM estimate "
            f"{_vmem_estimate(c, b, max_len, nc, bk, kh) / 2**20:.1f} MiB > "
            f"{_VMEM_BUDGET / 2**20:.1f} MiB budget); falling back to auto "
            f"NC — benchmark numbers will reflect the auto choice",
            stacklevel=3,
        )
    nc = auto_nc()
    bk, kh = auto_bk_kh(nc)
    # if the BK/KH floors alone can't fit the budget, trade chunk width
    # for headroom: halving NC halves the weight double-buffers
    while (
        _vmem_estimate(c, b, max_len, nc, bk, kh) > _budget(c, kh)
        and nc > 128 and nc % 2 == 0 and c.hidden_size // (nc // 2) >= 2
    ):
        nc //= 2
        bk, kh = auto_bk_kh(nc)
    return nc, bk, kh


def _kernel(
    # scalar prefetch
    lens_ref,     # [b] int32 — pre-append length per slot
    act_ref,      # [b] int32 — 1 where the slot commits
    # VMEM inputs
    x_ref,        # [b, H] dtype — embedded token
    qcos_ref,     # [b, hd/2] f32 — RoPE at each slot's current position
    qsin_ref,
    kcos_ref,     # [S//BK, hd/2, BK] f32 — cache K-RoPE tables, chunked so
    ksin_ref,     # the kernel indexes the leading (block) dim
    qkv_s_ref,    # [L, 1, Dq] f32 weight scales
    o_s_ref,      # [L, 1, H]
    gu_s_ref,     # [L, 1, 2I]
    dn_s_ref,     # [L, 1, H]
    anorm_ref,    # [L, 1, H] (leading-dim layer index)
    mnorm_ref,    # [L, 1, H]
    # HBM (ANY) inputs
    qkv_w_ref,    # [L, H, Dq] int8
    o_w_ref,      # [L, H, H] int8
    gu_w_ref,     # [L, H, 2I] int8
    dn_w_ref,     # [L, I, H] int8
    kq_hbm,       # [L, b, kvh, hd(/2), S] int8/uint8 (read-only)
    ks_hbm,       # [L, b, 1, S] f32
    vq_hbm,       # [L, b, kvh, hd(/2), S] int8/uint8 — V shares K's
                  # transposed layout (round 4), so both stream by plain
                  # column-slice DMA; /2 extents are the KV4 nibble-packed
                  # container (kv_pack)
    vs_hbm,       # [L, b, 1, S] f32
    # outputs
    y_ref,        # [b, H] dtype — final hidden (pre-final-norm)
    kint_ref,     # [1, b, kv_dim] int8 block — this layer's new K ints
    vint_ref,     # [1, b, kv_dim] int8
    kinv_ref,     # [1, b, 1] f32 — inverse scales
    vinv_ref,     # [1, b, 1] f32
    # scratch
    h_ref,        # [b, H] dtype — residual stream (persists across grid)
    xq_ref,       # [BM, Kmax] int8 — quantized activations (rows b.. zero)
    qkv_ref,      # [b, Dq] dtype
    attn_ref,     # [b, H] dtype
    gu_ref,       # [b, 2I] dtype
    qrot_ref,     # [b, nh*hd] f32 — post-RoPE query (2-D rope staging)
    q4_ref,       # [b, kvh, groups, hd] f32 — same values, head-major for
                  # [groups, hd] loads with leading indices
    m_ref,        # [b, kvh, groups, 1] f32 — or [b, kvh*groups, 1] when
                  # ``batched_att`` (cross-head batched softmax update)
    l_ref,        # (same layout rule)
    acc_ref,      # [b, kvh, groups, hd] / [b, kvh*groups, hd] f32
    s_scr,        # [kvh*groups, BK] f32 — batched score staging (unused
                  # on the per-head path)
    wA_ref,       # [2, H, NC] int8
    wB_ref,       # [2, I, NC] int8
    kbuf_ref,     # [2, b, kvh, hd(/2), BK] int8/uint8
    ksb_ref,      # [2, b, 1, BK] f32
    vbuf_ref,     # [2, b, kvh, hd(/2), BK] int8/uint8 (transposed V chunks)
    vsb_ref,      # [2, b, 1, BK] f32
    semA, semB, sematt,
    *,
    cfg: LlamaConfig,
    b: int,
    BM: int,
    NC: int,
    BK: int,
    KH: int,       # KV-head tile: the cache streams KH heads at a time
                   # (KH == kvh for GQA shapes; MHA shapes shrink KH to
                   # fit the KV double-buffers in scoped VMEM)
    rope: bool,    # pre mode: rotate K on read
    w4: bool,      # int4 split-half packed weights (quant_matmul.pack_int4)
    kv_pack: bool,  # KV4 nibble-packed cache: hd split-half per byte
    batched_att: bool,  # one masked max/exp/sum across a whole head tile
                   # per slot per block (requires groups % 8 == 0 so
                   # per-head sublane slices stay aligned) — cuts the VPU
                   # instruction count that bounds b>=16 (VERDICT r3 #7)
    rep: int = 1,  # MHA row replication: groups==1 heads replicate to 8
                   # sublane rows so per-head slices stay 8-aligned and the
                   # batched softmax applies at no extra VPU cost (round 5)
    dtype=None,
):
    c = cfg
    L = c.num_hidden_layers
    H = c.hidden_size
    I = c.intermediate_size
    hd = c.head_dim
    h2 = hd // 2
    kvh = c.kv_heads
    nh = c.num_attention_heads
    groups = nh // kvh
    NT = kvh // KH  # head tiles per KV block
    kv_dim = kvh * hd
    Dq = H + 2 * kv_dim
    S = kq_hbm.shape[-1]
    kb_bits = min(c.kv_bits, 8)
    scale = 1.0 / (hd ** 0.5)
    a_qmax = float(2 ** (c.a_bits - 1) - 1)
    kv_qmax = float(2 ** (kb_bits - 1) - 1)
    ct = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

    l_id = pl.program_id(0)

    # head-indexed views of the softmax state, valid under both scratch
    # layouts: batched_att flattens each TILE's (KH, groups) into one
    # sublane dim — [b, NT, KH*groups, *] — so a single vector op updates
    # a whole tile's m/l/p; per-head slices land at offsets (hh%KH)*groups,
    # aligned because batched_att requires groups % 8 == 0. The tile index
    # rides a leading dim so it may be dynamic.
    if batched_att:
        ge = groups * rep
        def hidx(i, hh):
            t, r = hh // KH, hh % KH
            return (i, t, slice(r * ge, (r + 1) * ge))
    else:
        def hidx(i, hh):
            return (i, hh)

    # ---- static weight-chunk schedule -----------------------------------
    nq, no, ngu, nB = Dq // NC, H // NC, (2 * I) // NC, H // NC
    A_SCHED = (
        [("qkv", j) for j in range(nq)]
        + [("o", j) for j in range(no)]
        + [("gu", j) for j in range(ngu)]
    )
    nA = len(A_SCHED)
    assert nA >= 2 and nB >= 2, (nA, nB)
    A_REFS = {"qkv": qkv_w_ref, "o": o_w_ref, "gu": gu_w_ref}

    def startA(seq, layer):
        stage, j = A_SCHED[seq]
        pltpu.make_async_copy(
            A_REFS[stage].at[layer, :, pl.ds(j * NC, NC)],
            wA_ref.at[seq % 2],
            semA.at[seq % 2],
        ).start()

    def waitA(seq, layer):
        stage, j = A_SCHED[seq]
        pltpu.make_async_copy(
            A_REFS[stage].at[layer, :, pl.ds(j * NC, NC)],
            wA_ref.at[seq % 2],
            semA.at[seq % 2],
        ).wait()

    def startB(j, layer):
        pltpu.make_async_copy(
            dn_w_ref.at[layer, :, pl.ds(j * NC, NC)],
            wB_ref.at[j % 2],
            semB.at[j % 2],
        ).start()

    def waitB(j, layer):
        pltpu.make_async_copy(
            dn_w_ref.at[layer, :, pl.ds(j * NC, NC)],
            wB_ref.at[j % 2],
            semB.at[j % 2],
        ).wait()

    # after computing A-chunk ``seq`` kick the DMA two slots ahead in the
    # global schedule — into the slot just freed
    def kick(seq):
        nxt = seq + 2
        if nxt < nA:
            startA(nxt, l_id)
        elif nxt < nA + 2:
            startB(nxt - nA, l_id)

    def kickB(j):
        nxt = j + 2
        if nxt < nB:
            startB(nxt, l_id)
        else:
            a = nxt - nB
            if a < 2:
                @pl.when(l_id + 1 < L)
                def _():
                    startA(a, l_id + 1)

    # ---- first grid step: prime the pipeline + clear padding ------------
    @pl.when(l_id == 0)
    def _():
        h_ref[:] = x_ref[:]
        xq_ref[:] = jnp.zeros_like(xq_ref)
        startA(0, 0)
        startA(1, 0)

    # ---- attention streaming: K/V/scale chunks in KH-head tiles ---------
    # the DMA sequence index t walks (KV block, head tile) pairs:
    # kb = t // NT, tile = t % NT — NT == 1 degenerates to whole-head
    # blocks. Per-token scales are re-fetched per tile (a few KB).
    lens = [lens_ref[i] for i in range(b)]
    maxlen = lens[0]
    for i in range(1, b):
        maxlen = jnp.maximum(maxlen, lens[i])
    nb = (maxlen + BK - 1) // BK  # dynamic
    ntot = nb * NT

    def att_copies(t, slot):
        kb_idx = t // NT
        tile = jax.lax.rem(t, NT)
        return [
            pltpu.make_async_copy(
                kq_hbm.at[l_id, :, pl.ds(tile * KH, KH), :,
                          pl.ds(kb_idx * BK, BK)],
                kbuf_ref.at[slot], sematt.at[slot, 0],
            ),
            pltpu.make_async_copy(
                ks_hbm.at[l_id, :, :, pl.ds(kb_idx * BK, BK)],
                ksb_ref.at[slot], sematt.at[slot, 1],
            ),
            pltpu.make_async_copy(
                vq_hbm.at[l_id, :, pl.ds(tile * KH, KH), :,
                          pl.ds(kb_idx * BK, BK)],
                vbuf_ref.at[slot], sematt.at[slot, 2],
            ),
            pltpu.make_async_copy(
                vs_hbm.at[l_id, :, :, pl.ds(kb_idx * BK, BK)],
                vsb_ref.at[slot], sematt.at[slot, 3],
            ),
        ]

    def att_start(t, slot):
        for cp in att_copies(t, slot):
            cp.start()

    def att_wait(t, slot):
        for cp in att_copies(t, slot):
            cp.wait()

    @pl.when(ntot > 0)
    def _():
        att_start(0, 0)
    if (S // BK) * NT > 1:  # static: a second tile exists at all
        @pl.when(ntot > 1)
        def _():
            att_start(1, 1)

    # ---- activation quantization helper ---------------------------------
    def quantize_act(vals, K):
        """vals [b, K] (dtype) -> xq_ref[:b, :K] int8; returns sx [b,1] f32
        (quant_matmul.quantize_per_token semantics)."""
        vf = vals.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
        sx = a_qmax / (absmax + _EPS)
        xq_ref[0:b, 0:K] = jnp.round(vf * sx).astype(jnp.int8)
        return sx

    def mm_chunk(K, w, sx, sw):
        """[BM,K]i8 @ [K(,/2),NC] int -> f32 [b, NC] with the int8 fixup.

        W4: the packed byte's nibbles are the split-half K rows
        (quant_matmul.pack_int4) — unpack is two shifts and the contraction
        is two independent int8 MXU dots over the K halves (integer
        accumulation is exact, so the K-order change cannot alter
        results)."""
        if w4:
            p = w.astype(jnp.int32)                    # [K/2, NC]
            wlo = ((p << 28) >> 28).astype(jnp.int8)   # K rows 0..K/2-1
            whi = ((p << 24) >> 28).astype(jnp.int8)   # K rows K/2..K-1
            kh = K // 2
            acc = jax.lax.dot_general(
                xq_ref[:, 0:kh], wlo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ) + jax.lax.dot_general(
                xq_ref[:, kh:K], whi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            acc = jax.lax.dot_general(
                xq_ref[:, 0:K], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return acc[0:b].astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))

    # =====================================================================
    # Stage 1: qkv projection
    # =====================================================================
    xn = llama.rms_norm(h_ref[:], anorm_ref[l_id, 0], c.rms_norm_eps)
    sx = quantize_act(xn, H)
    for seq in range(nq):
        waitA(seq, l_id)
        sw = qkv_s_ref[l_id, :, pl.ds(seq * NC, NC)]       # [1, NC]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        qkv_ref[:, pl.ds(seq * NC, NC)] = out.astype(dtype)
        kick(seq)

    # ---- current-token K/V quantization (returned for the XLA commit) ---
    q_dim = nh * hd
    kv_new = qkv_ref[:, q_dim:q_dim + kv_dim]              # [b, kv_dim]
    vv_new = qkv_ref[:, q_dim + kv_dim:]
    if not rope:
        # post-RoPE cache mode: rotate K at its absolute position BEFORE
        # quantizing (model._serving_layer's kv_cache_rope == "post");
        # per-head 2-D slices — lane-splitting vector reshapes don't lower
        kc2 = qcos_ref[:].astype(kv_new.dtype)             # [b, h2]
        ks2 = qsin_ref[:].astype(kv_new.dtype)
        parts = []
        for hh in range(kvh):
            kh2 = kv_new[:, hh * hd:(hh + 1) * hd]
            k1_, k2_ = kh2[:, :h2], kh2[:, h2:]
            parts.append(jnp.concatenate(
                [k1_ * kc2 - k2_ * ks2, k2_ * kc2 + k1_ * ks2], axis=-1
            ))
        kv_new = jnp.concatenate(parts, axis=-1)
    kf = kv_new.astype(jnp.float32)
    vf = vv_new.astype(jnp.float32)
    ks_s = kv_qmax / (jnp.max(jnp.abs(kf), axis=-1, keepdims=True) + _EPS)
    vs_s = kv_qmax / (jnp.max(jnp.abs(vf), axis=-1, keepdims=True) + _EPS)
    k_int = jnp.round(kf * ks_s).astype(jnp.int8)          # [b, kv_dim]
    v_int = jnp.round(vf * vs_s).astype(jnp.int8)
    k_inv = 1.0 / (ks_s + _EPS)                            # [b, 1]
    v_inv = 1.0 / (vs_s + _EPS)
    kint_ref[0] = k_int
    vint_ref[0] = v_int
    kinv_ref[0] = k_inv
    vinv_ref[0] = v_inv

    # ---- query RoPE (per-head 2-D, then head-major scatter) -------------
    qc2 = qcos_ref[:].astype(dtype)                        # [b, h2]
    qs2 = qsin_ref[:].astype(dtype)
    for hh in range(kvh):
        for g in range(groups):
            base = (hh * groups + g) * hd
            qv2 = qkv_ref[:, base:base + hd]               # [b, hd]
            q1, q2 = qv2[:, :h2], qv2[:, h2:]
            qr = jnp.concatenate(
                [q1 * qc2 - q2 * qs2, q2 * qc2 + q1 * qs2], axis=-1
            )
            qrot_ref[:, base:base + hd] = qr.astype(ct).astype(jnp.float32)
    # [1, hd] slices need no reshape on either side
    for i in range(b):
        for hh in range(kvh):
            for g in range(groups):
                base = (hh * groups + g) * hd
                q4_ref[i, hh, g:g + 1, :] = qrot_ref[i:i + 1, base:base + hd]

    # =====================================================================
    # Stage 2: attention over the streamed int8 cache (online softmax)
    # =====================================================================
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def att_body(t, _):
        slot = jax.lax.rem(t, 2)
        kb_idx = t // NT
        tile = jax.lax.rem(t, NT)
        att_wait(t, slot)
        start = kb_idx * BK
        if rope:
            cos = kcos_ref[kb_idx]                         # [hd/2, BK]
            sin = ksin_ref[kb_idx]
        col = start + jax.lax.broadcasted_iota(jnp.int32, (groups, BK), 1)
        col_all = start + jax.lax.broadcasted_iota(
            jnp.int32, (KH * groups * rep, BK), 1
        )
        for i in range(b):
            # a block past slot i's length contributes nothing — skipping it
            # also avoids the exp(-inf - -inf) = 1 poisoning of l for fully
            # masked blocks (mirrors the scan kernel's n_valid grid clamp)
            @pl.when(start < lens[i])
            def _(i=i):
                ksl = ksb_ref[slot, i]                     # [1, BK] inv scl
                vsl = vsb_ref[slot, i]                     # [1, BK]
                valid = col < lens[i]
                if rope:
                    cc = (cos * ksl).astype(ct)            # [h2, BK]
                    ss = (sin * ksl).astype(ct)

                def kr_of(hh):
                    kq_ih = kbuf_ref[slot, i, hh]          # [hd(/2), BK] int
                    if kv_pack:
                        # the byte's nibbles are the split-half hd rows —
                        # exactly the k1/k2 halves rotate-half wants
                        pi = kq_ih.astype(jnp.int32)
                        k1 = ((pi << 28) >> 28).astype(ct)  # rows 0..h2-1
                        k2 = ((pi << 24) >> 28).astype(ct)  # rows h2..hd-1
                    else:
                        k1 = kq_ih[0:h2].astype(ct)
                        k2 = kq_ih[h2:hd].astype(ct)
                    if rope:
                        return jnp.concatenate(
                            [k1 * cc - k2 * ss, k2 * cc + k1 * ss], axis=0
                        )
                    sl = ksl.astype(ct)
                    return jnp.concatenate([k1 * sl, k2 * sl], axis=0)

                def v_of(hh):
                    if kv_pack:
                        vp = vbuf_ref[slot, i, hh].astype(jnp.int32)
                        return jnp.concatenate(
                            [
                                ((vp << 28) >> 28).astype(ct),
                                ((vp << 24) >> 28).astype(ct),
                            ],
                            axis=0,
                        )                                  # [hd, BK]
                    return vbuf_ref[slot, i, hh].astype(ct)  # [hd, BK]

                if batched_att:
                    # stage the TILE's scores, then ONE masked max/exp/sum
                    # across the flattened (KH*groups*rep) sublane dim —
                    # the per-head VPU op count was the b>=16 bottleneck
                    # (DESIGN.md megakernel notes). m/l/acc carry a
                    # leading NT dim so the (dynamic) tile index stays on
                    # an untiled dim. At MHA (groups=1, rep=8) each head's
                    # query is replicated to 8 identical rows: slice
                    # offsets become 8-aligned and the whole tile shares
                    # one softmax update at no extra VPU cost.
                    ge = groups * rep
                    for hh in range(KH):
                        q_ih = q4_ref[i, tile * KH + hh].astype(ct)
                        if rep > 1:
                            q_ih = jnp.broadcast_to(q_ih, (ge, q_ih.shape[-1]))
                        s_scr[hh * ge:(hh + 1) * ge, :] = (
                            jax.lax.dot_general(
                                q_ih, kr_of(hh), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        )
                    s = jnp.where(
                        col_all < lens[i],
                        s_scr[0:KH * ge, :] * scale, _NEG_INF,
                    )                                      # [KH*ge, BK]
                    m_prev = m_ref[i, tile]                # [KH*g, 1]
                    l_prev = l_ref[i, tile]
                    m_blk = jnp.max(s, axis=-1, keepdims=True)
                    m_new = jnp.maximum(m_prev, m_blk)
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    m_ref[i, tile] = m_new
                    l_ref[i, tile] = l_prev * alpha + jnp.sum(
                        p, axis=-1, keepdims=True
                    )
                    pv = (p * vsl).astype(ct)              # [KH*ge, BK]
                    for hh in range(KH):
                        g0, g1 = hh * ge, (hh + 1) * ge
                        acc_ref[i, tile, g0:g1] = (
                            acc_ref[i, tile, g0:g1] * alpha[g0:g1]
                            + jax.lax.dot_general(
                                pv[g0:g1], v_of(hh),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        )
                else:
                    for hh in range(KH):
                        ah = tile * KH + hh                # absolute head
                        q_ih = q4_ref[i, ah].astype(ct)    # [groups, hd]
                        s = jax.lax.dot_general(
                            q_ih, kr_of(hh), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        s = jnp.where(valid, s * scale, _NEG_INF)
                        m_prev = m_ref[i, ah]
                        l_prev = l_ref[i, ah]
                        m_blk = jnp.max(s, axis=-1, keepdims=True)
                        m_new = jnp.maximum(m_prev, m_blk)
                        alpha = jnp.exp(m_prev - m_new)
                        p = jnp.exp(s - m_new)
                        m_ref[i, ah] = m_new
                        l_ref[i, ah] = l_prev * alpha + jnp.sum(
                            p, axis=-1, keepdims=True
                        )
                        # V streams transposed ([hd, BK], K's layout);
                        # fold the inverse scale into p and contract over
                        # BK with a transposed-rhs dot
                        pv = (p * vsl).astype(ct)          # [groups, BK]
                        acc_ref[i, ah] = (
                            acc_ref[i, ah] * alpha + jax.lax.dot_general(
                                pv, v_of(hh), (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                        )
        @pl.when(t + 2 < ntot)
        def _():
            att_start(t + 2, slot)
        return 0

    jax.lax.fori_loop(0, ntot, att_body, 0)

    # ---- fold the current token as a final online-softmax pair ----------
    # (active slots only — inactive slots don't advance, matching the scan
    # path where new_len stays at seq_lens). Per-(slot, head) 2-D math.
    for i in range(b):
        act_i = act_ref[i] != 0
        kinv_i = k_inv[i:i + 1]                            # [1, 1] f32
        vinv_i = v_inv[i:i + 1].astype(ct)
        if rope:
            # table cos/sin at the slot's position == qcos/qsin; fold the
            # inverse scale in like the streaming loop does
            cc_i = (qcos_ref[i:i + 1] * kinv_i).astype(ct)  # [1, h2]
            ss_i = (qsin_ref[i:i + 1] * kinv_i).astype(ct)
        for hh in range(kvh):
            kih = k_int[i:i + 1, hh * hd:(hh + 1) * hd]    # [1, hd] int8
            if rope:
                k1 = kih[:, :h2].astype(ct)
                k2 = kih[:, h2:].astype(ct)
                k_fold = jnp.concatenate(
                    [k1 * cc_i - k2 * ss_i, k2 * cc_i + k1 * ss_i], axis=-1
                ).astype(jnp.float32)                      # [1, hd]
            else:
                k_fold = (kih.astype(ct) * kinv_i.astype(ct)).astype(
                    jnp.float32
                )
            v_fold = (
                v_int[i:i + 1, hh * hd:(hh + 1) * hd].astype(ct) * vinv_i
            ).astype(jnp.float32)                          # [1, hd]
            qf = q4_ref[i, hh]                             # [groups, hd] f32
            if batched_att and rep > 1:
                qf = jnp.broadcast_to(qf, (groups * rep, qf.shape[-1]))
            s_cur = jax.lax.dot_general(
                qf, k_fold, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                      # [groups, 1]
            s_cur = jnp.where(act_i, s_cur, _NEG_INF)
            m_prev = m_ref[hidx(i, hh)]
            l_prev = l_ref[hidx(i, hh)]
            m_new = jnp.maximum(m_prev, s_cur)
            alpha = jnp.exp(m_prev - m_new)
            # zero (not exp(-inf - -inf) = 1) where the fold is inactive —
            # the token doesn't exist for that slot
            p = jnp.where(act_i, jnp.exp(s_cur - m_new), 0.0)
            l_new = jnp.maximum(l_prev * alpha + p, 1e-9)
            acc = acc_ref[hidx(i, hh)] * alpha + jax.lax.dot_general(
                p, v_fold, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ih = (acc / l_new).astype(dtype)             # [groups, hd]
            for g in range(groups):
                base = (hh * groups + g) * hd
                attn_ref[i:i + 1, base:base + hd] = o_ih[g:g + 1, :]

    # =====================================================================
    # Stage 3: o projection (+ residual)
    # =====================================================================
    sx = quantize_act(attn_ref[:], H)
    for j in range(no):
        seq = nq + j
        waitA(seq, l_id)
        sw = o_s_ref[l_id, :, pl.ds(j * NC, NC)]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        h_ref[:, pl.ds(j * NC, NC)] = (
            h_ref[:, pl.ds(j * NC, NC)] + out.astype(dtype)
        )
        kick(seq)

    # =====================================================================
    # Stage 4: gate/up projection
    # =====================================================================
    xn2 = llama.rms_norm(h_ref[:], mnorm_ref[l_id, 0], c.rms_norm_eps)
    sx = quantize_act(xn2, H)
    for j in range(ngu):
        seq = nq + no + j
        waitA(seq, l_id)
        sw = gu_s_ref[l_id, :, pl.ds(j * NC, NC)]
        out = mm_chunk(H, wA_ref[seq % 2], sx, sw)
        gu_ref[:, pl.ds(j * NC, NC)] = out.astype(dtype)
        kick(seq)

    # =====================================================================
    # Stage 5: down projection (+ residual)
    # =====================================================================
    gate = gu_ref[:, 0:I]
    up = gu_ref[:, I:]
    # silu in f32 then cast: Mosaic miscompiles the bf16 sigmoid's scalar
    # broadcast; the activation is quantized right after, so the extra
    # precision is free
    actv = (
        jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    ).astype(dtype)                                        # [b, I]
    sx = quantize_act(actv, I)
    for j in range(nB):
        waitB(j, l_id)
        sw = dn_s_ref[l_id, :, pl.ds(j * NC, NC)]
        out = mm_chunk(I, wB_ref[j % 2], sx, sw)
        h_ref[:, pl.ds(j * NC, NC)] = (
            h_ref[:, pl.ds(j * NC, NC)] + out.astype(dtype)
        )
        kickB(j)

    y_ref[:] = h_ref[:]


@functools.partial(jax.jit, static_argnames=("config", "dtype"))
def decode_step(
    qparams: Dict[str, Any],
    config: LlamaConfig,
    input_ids: jax.Array,    # [b, 1]
    seq_lens: jax.Array,     # [b]
    active: jax.Array,       # [b] bool
    cache: Dict[str, jax.Array],
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Megakernel decode step — same contract as model._forward at s=1."""
    c = config
    b, s = input_ids.shape
    assert s == 1, input_ids.shape
    k_q, k_s, v_q, v_s = cache["k_q"], cache["k_s"], cache["v_q"], cache["v_s"]
    L, _, kvh = k_q.shape[:3]
    S = k_q.shape[-1]
    hd = c.head_dim
    kv_pack = bool(c.kv_cache_pack) and c.kv_bits <= 4  # model.cache_is_packed
    assert k_q.shape[3] == (hd // 2 if kv_pack else hd), (k_q.shape, kv_pack)
    assert v_q.shape == k_q.shape, ("V shares K's transposed layout",
                                    v_q.shape, k_q.shape)
    H = c.hidden_size
    I = c.intermediate_size
    kv_dim = kvh * hd
    Dq = H + 2 * kv_dim
    NC, BK, KH = _pick_nc_bk(c, b, S)
    BM = max(32, -(-b // 8) * 8)
    rope = c.kv_cache_rope != "post"
    groups_ = c.num_attention_heads // kvh
    # cross-head batched softmax (one masked max/exp/sum per slot per
    # block): per-head sublane slices must land at multiples of 8. MHA
    # (groups=1) batches by replicating each head's query to rep=8 rows —
    # offsets align and the VPU cost is unchanged (round 5)
    rep_ = 8 if (groups_ == 1 and KH % 8 == 0) else 1
    batched_att = (groups_ % 8 == 0 and kvh > 1) or rep_ > 1
    ge_ = groups_ * rep_

    h = jnp.take(qparams["embed"], input_ids[:, 0], axis=0).astype(dtype)
    positions = seq_lens[:, None]                          # [b, 1]
    qcos, qsin = llama.rope_cos_sin(positions, hd, c.rope_theta)
    qcos = qcos[:, 0, : hd // 2]                           # [b, hd/2] f32
    qsin = qsin[:, 0, : hd // 2]
    cache_pos = jnp.arange(S, dtype=jnp.int32)[None]
    kcos, ksin = llama.rope_cos_sin(cache_pos, hd, c.rope_theta)
    # chunked-by-block layout [S//BK, hd/2, BK]: the kernel indexes the
    # leading dim with the (dynamic) block id — Mosaic only allows dynamic
    # indices on untiled leading dims
    kcos_t = jnp.moveaxis(
        kcos[0, :, : hd // 2].T.reshape(hd // 2, S // BK, BK), 1, 0
    )
    ksin_t = jnp.moveaxis(
        ksin[0, :, : hd // 2].T.reshape(hd // 2, S // BK, BK), 1, 0
    )

    lay = qparams["layers"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qcos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qsin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kcos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ksin
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gu_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # dn_s
            pl.BlockSpec(memory_space=pltpu.VMEM),   # anorm
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mnorm
            pl.BlockSpec(memory_space=pl.ANY),       # qkv_w
            pl.BlockSpec(memory_space=pl.ANY),       # o_w
            pl.BlockSpec(memory_space=pl.ANY),       # gu_w
            pl.BlockSpec(memory_space=pl.ANY),       # dn_w
            pl.BlockSpec(memory_space=pl.ANY),       # k_q
            pl.BlockSpec(memory_space=pl.ANY),       # k_s
            pl.BlockSpec(memory_space=pl.ANY),       # v_q
            pl.BlockSpec(memory_space=pl.ANY),       # v_s
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # y
            pl.BlockSpec((1, b, kv_dim), lambda l, *_: (l, 0, 0)),  # k ints
            pl.BlockSpec((1, b, kv_dim), lambda l, *_: (l, 0, 0)),  # v ints
            pl.BlockSpec((1, b, 1), lambda l, *_: (l, 0, 0)),       # k inv
            pl.BlockSpec((1, b, 1), lambda l, *_: (l, 0, 0)),       # v inv
        ],
        scratch_shapes=[
            pltpu.VMEM((b, H), dtype),               # h
            pltpu.VMEM((BM, max(H, I)), jnp.int8),   # xq
            pltpu.VMEM((b, Dq), dtype),              # qkv
            pltpu.VMEM((b, H), dtype),               # attn
            pltpu.VMEM((b, 2 * I), dtype),           # gu
            pltpu.VMEM((b, c.num_attention_heads * hd),
                       jnp.float32),                 # qrot
            pltpu.VMEM((b, kvh, c.num_attention_heads // kvh, hd),
                       jnp.float32),                 # q4
            pltpu.VMEM(
                (b, kvh // KH, KH * ge_, 1) if batched_att
                else (b, kvh, groups_, 1),
                jnp.float32,
            ),                                       # m
            pltpu.VMEM(
                (b, kvh // KH, KH * ge_, 1) if batched_att
                else (b, kvh, groups_, 1),
                jnp.float32,
            ),                                       # l
            pltpu.VMEM(
                (b, kvh // KH, KH * ge_, hd) if batched_att
                else (b, kvh, groups_, hd),
                jnp.float32,
            ),                                       # acc
            pltpu.VMEM((KH * ge_, BK), jnp.float32),  # s_scr
            pltpu.VMEM(
                (2, H // 2 if c.w_bits == 4 else H, NC),
                jnp.uint8 if c.w_bits == 4 else jnp.int8,
            ),                                       # wA
            pltpu.VMEM(
                (2, I // 2 if c.w_bits == 4 else I, NC),
                jnp.uint8 if c.w_bits == 4 else jnp.int8,
            ),                                       # wB
            pltpu.VMEM(
                (2, b, KH, hd // 2 if kv_pack else hd, BK),
                jnp.uint8 if kv_pack else jnp.int8,
            ),                                       # kbuf
            pltpu.VMEM((2, b, 1, BK), jnp.float32),      # ksb
            pltpu.VMEM(
                (2, b, KH, hd // 2 if kv_pack else hd, BK),
                jnp.uint8 if kv_pack else jnp.int8,
            ),                                       # vbuf
            pltpu.VMEM((2, b, 1, BK), jnp.float32),      # vsb
            pltpu.SemaphoreType.DMA((2,)),           # semA
            pltpu.SemaphoreType.DMA((2,)),           # semB
            pltpu.SemaphoreType.DMA((2, 4)),         # sematt
        ],
    )

    w4 = c.w_bits == 4
    kernel = functools.partial(
        _kernel, cfg=c, b=b, BM=BM, NC=NC, BK=BK, KH=KH, rope=rope, w4=w4,
        kv_pack=kv_pack, batched_att=batched_att, rep=rep_, dtype=dtype,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((b, H), dtype),
        jax.ShapeDtypeStruct((L, b, kv_dim), jnp.int8),
        jax.ShapeDtypeStruct((L, b, kv_dim), jnp.int8),
        jax.ShapeDtypeStruct((L, b, 1), jnp.float32),
        jax.ShapeDtypeStruct((L, b, 1), jnp.float32),
    ]
    y, k_ints, v_ints, k_invs, v_invs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(
        seq_lens.astype(jnp.int32), active.astype(jnp.int32),
        h, qcos, qsin, kcos_t, ksin_t,
        lay["qkv"]["s"], lay["o"]["s"], lay["gateup"]["s"], lay["down"]["s"],
        jnp.asarray(lay["attn_norm"])[:, None, :],
        jnp.asarray(lay["mlp_norm"])[:, None, :],
        lay["qkv"]["q"], lay["o"]["q"], lay["gateup"]["q"], lay["down"]["q"],
        k_q, k_s[:, :, None, :], v_q, v_s[:, :, None, :],
    )

    # ---- commit the new K/V columns (one small in-place write per step) -
    write_pos = jnp.where(active, seq_lens, S - 1).astype(jnp.int32)
    kq_cols = k_ints.reshape(L, b, kvh, hd, 1)
    vq_cols = v_ints.reshape(L, b, kvh, hd, 1)
    if kv_pack:
        from llm_qat_tpu.inference.model import _pack_nibbles

        kq_cols = _pack_nibbles(kq_cols, axis=3)   # [L, b, kvh, hd/2, 1]
        vq_cols = _pack_nibbles(vq_cols, axis=3)

    def upd_k(cq, col, wp):
        return jax.lax.dynamic_update_slice(cq, col, (0, 0, 0, wp))

    def upd_s(cs, val, wp):
        return jax.lax.dynamic_update_slice(cs, val, (0, wp))

    k_q2 = jax.vmap(upd_k, in_axes=(1, 1, 0), out_axes=1)(
        k_q, kq_cols, write_pos
    )
    v_q2 = jax.vmap(upd_k, in_axes=(1, 1, 0), out_axes=1)(
        v_q, vq_cols, write_pos
    )
    k_s2 = jax.vmap(upd_s, in_axes=(1, 1, 0), out_axes=1)(
        k_s, k_invs, write_pos
    )
    v_s2 = jax.vmap(upd_s, in_axes=(1, 1, 0), out_axes=1)(
        v_s, v_invs, write_pos
    )

    hf = llama.rms_norm(y[:, None, :], qparams["final_norm"], c.rms_norm_eps)
    head = (
        qparams["embed"].T if "lm_head" not in qparams else qparams["lm_head"]
    )
    logits = jnp.matmul(
        hf, head.astype(hf.dtype), preferred_element_type=jnp.float32
    )
    new_len = jnp.where(active, seq_lens + 1, seq_lens)
    new_cache = {
        "k_q": k_q2, "k_s": k_s2, "v_q": v_q2, "v_s": v_s2,
        "lengths": new_len,
    }
    return logits, new_cache
