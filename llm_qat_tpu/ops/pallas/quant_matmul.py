"""Pallas TPU kernels: true low-bit quantized matmul.

The reference never ships real integer kernels — its `QuantizeLinear`
dequantizes to fp and calls cuBLAS (utils_quant.py:250). The BASELINE.json
north star asks for a genuine low-bit path: int8 weights/activations on the
MXU with int32 accumulation and the per-channel / per-token scale fixup
applied on the way out of VMEM.

Math contract (matches `ops.quantize.sym_fake_quant` exactly up to integer
associativity, which is *more* exact than the fp fake-quant emulation):

    s_w[j] = 127 / (absmax_k |w[k,j]| + 1e-6)      per output channel
    s_x[i] = 127 / (absmax_k |x[i,k]| + 1e-6)      per token
    wq = round(w * s_w)  (int8);  xq = round(x * s_x)  (int8)
    out[i,j] = (sum_k xq[i,k] * wq[k,j]) / ((s_x[i]+1e-6) * (s_w[j]+1e-6))

Kernel: grid (M/bm, N/bn, K/bk), int8 x/w tiles in VMEM, int32 accumulator
scratch, scale fixup + cast on the final K step. int8 MXU matmuls run at 2x
the bf16 rate on v5e and halve the HBM weight traffic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # reference epsilon (utils_quant.py:71-72)


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests/CI).
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Host-side quantizers (produce the true-int operands)
# ---------------------------------------------------------------------------


def quantize_per_token(
    x: jax.Array, bits: int = 8, amax: jax.Array = None
) -> Tuple[jax.Array, jax.Array]:
    """[... , K] -> (int8 values, f32 scales [..., 1]); symmetric absmax with
    the reference's +1e-6 (sym_fake_quant per-token semantics).

    ``amax`` overrides the local absmax — tensor-parallel callers pass the
    pmax over the sharded K so every shard quantizes with the single-device
    scale (numerics identical to unsharded)."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = (
        jnp.max(jnp.abs(x), axis=-1, keepdims=True) if amax is None else amax
    )
    s = qmax / (absmax.astype(jnp.float32) + _EPS)
    q = jnp.round(x.astype(jnp.float32) * s).astype(jnp.int8)
    return q, s


def quantize_per_channel(w: jax.Array, bits: int = 8) -> Tuple[jax.Array, jax.Array]:
    """[K, N] -> (int8 values, f32 scales [1, N]); per-output-channel."""
    qmax = float(2 ** (bits - 1) - 1)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    s = qmax / (absmax.astype(jnp.float32) + _EPS)
    q = jnp.round(w.astype(jnp.float32) * s).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # stacked-weight callers pass blocks with a leading singleton layer dim
    w = w_ref[:] if w_ref.ndim == 2 else w_ref[0]
    sw = sw_ref[:] if sw_ref.ndim == 2 else sw_ref[0]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        inv = 1.0 / ((sx_ref[:] + _EPS) * (sw + _EPS))
        out_ref[:] = (acc_ref[:].astype(jnp.float32) * inv).astype(out_ref.dtype)


def _shrink_to_vmem(
    M: int, N: int, K: int, bm: int, bn: int, bk: int,
    out_bytes: int, x_tiles: int = 1,
) -> Tuple[int, int, int]:
    """Shrink tile sizes until the kernel's VMEM working set fits.

    Pipeline holds double-buffered x/w/out tiles plus the int32 accumulator;
    with f32 outputs the decode-tuned defaults (512, 2048, 1024) need ~17.5MB
    and the Mosaic scoped-vmem limit is 16MB (measured Mosaic overhead over
    this estimate is ~2MB, hence the 13.5MB budget). Shrink bn first — it
    halves the f32 out tile + acc together; measured fastest fit for the
    QAT-forward shape class (M=b*s, f32 out) on v5e. ``x_tiles`` is 2 for
    the int4 kernel (low/high half activation tiles)."""
    budget = 27 * 2 ** 19  # 13.5MB
    if x_tiles == 2:
        # int4 path: Mosaic's real allocation runs ~2x this usage model
        # (13B qkv, M=8192 K=5120 N=15360: model 8.39M, Mosaic 16.02M —
        # 24KB OVER the limit; round 5). Shapes whose N divides by 1024
        # are the only ones the looser budget let pick the oversized bn
        # (7B's N=22016 falls to bn=512 on divisibility alone), so the
        # int4 class budgets under that pick's usage and takes one more
        # bk halving there; every previously-compiling shape keeps its
        # tiles (their usage is <= 6.3M).
        budget = 8 * 2 ** 20

    def usage(bm, bn, bk):
        return (
            2 * x_tiles * bm * bk      # int8 x tiles (double-buffered)
            + 2 * bk * bn              # int8/uint8 w tile
            + 2 * bm * bn * out_bytes  # out tile
            + bm * bn * 4              # acc scratch
            + 8 * (bm + bn)            # scales
        )

    while usage(bm, bn, bk) > budget:
        prev = (bm, bn, bk)
        if bn >= bm and bn > 256:
            bn = _fit_tile(N, bn // 2)
        elif bk > 256:
            bk = _fit_tile(K, bk // 2)
        elif bm > 256:
            bm = _fit_tile(M, bm // 2)
        if (bm, bn, bk) == prev:
            break
    return bm, bn, bk


def _mosaic_ok(*pairs) -> bool:
    """Mosaic's lowering rule for the last two dims of every block: last
    dim divisible by 128 or equal to the array's, second-to-last divisible
    by 8 or equal to the array's. Tiny-model shapes (unit tests, smoke
    configs) can fail this — callers fall back to the bit-identical XLA
    int dot instead of crashing in lowering."""
    for (a, b), (A, B) in pairs:
        if b % 128 and b != B:
            return False
        if a % 8 and a != A:
            return False
    return True


def _fit_tile(dim: int, target: int) -> int:
    """Largest divisor of ``dim`` that is <= target, preferring divisors
    aligned to the 256-lane/sublane granularity (a halving-only search lands
    on 64 for K=11008 and shreds the grid; 1376 = 43*32 is far better)."""
    t = min(target, dim)
    for align in (256, 32, 1):
        c = t - t % align if align > 1 else t
        while c >= align and dim % c:
            c -= align
        if c >= align:
            return c
    return 1


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk")
)
def int8_matmul(
    xq: jax.Array,   # [M, K] int8
    wq: jax.Array,   # [K, N] int8
    sx: jax.Array,   # [M, 1] f32 per-token scales
    sw: jax.Array,   # [1, N] f32 per-channel scales
    *,
    out_dtype=jnp.bfloat16,
    # defaults from the decode-shape sweep on v5e (86-89% of weight-HBM
    # speed-of-light at M=8..32 across llama-7B projections); non-dividing
    # dims fall back to the largest aligned divisor
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,
) -> jax.Array:
    """True-int8 matmul with scale fixup: ``(xq @ wq) / (sx * sw)``."""
    M, K = xq.shape
    K2, N = wq.shape
    assert K == K2, (xq.shape, wq.shape)
    bm, bn, bk = _fit_tile(M, bm), _fit_tile(N, bn), _fit_tile(K, bk)
    bm, bn, bk = _shrink_to_vmem(
        M, N, K, bm, bn, bk, jnp.dtype(out_dtype).itemsize
    )
    assert M % bm == 0 and N % bn == 0 and K % bk == 0, (M, N, K, bm, bn, bk)
    if not _interpret() and not _mosaic_ok(
        ((bm, bk), (M, K)), ((bk, bn), (K, N)),
        ((bm, 1), (M, 1)), ((1, bn), (1, N)), ((bm, bn), (M, N)),
    ):
        return int8_matmul_xla(xq, wq, sx, sw, out_dtype=out_dtype)

    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, wq, sx, sw)


@functools.partial(
    jax.jit, static_argnames=("layer", "out_dtype", "bm", "bn", "bk")
)
def int8_matmul_stacked(
    xq: jax.Array,     # [M, K] int8
    wq_all: jax.Array,  # [L, K, N] int8 — the WHOLE stacked weight
    sx: jax.Array,     # [M, 1] f32
    sw_all: jax.Array,  # [L, 1, N] f32
    *,
    layer: int,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,
) -> jax.Array:
    """`int8_matmul` reading layer ``layer`` of a stacked weight in place.

    Callers pass the full ``[L, K, N]`` array and select the layer
    *statically in the index map*: no XLA-level slice exists, so nothing is
    copied before the custom call — the fix for the scan path's per-layer
    HBM slice copies (DESIGN.md "Decode speed-of-light study"; originally
    built for the since-deleted unrolled study variant)."""
    M, K = xq.shape
    L, K2, N = wq_all.shape
    assert K == K2 and 0 <= layer < L, (xq.shape, wq_all.shape, layer)
    bm, bn, bk = _fit_tile(M, bm), _fit_tile(N, bn), _fit_tile(K, bk)
    bm, bn, bk = _shrink_to_vmem(
        M, N, K, bm, bn, bk, jnp.dtype(out_dtype).itemsize
    )
    if not _interpret() and not _mosaic_ok(
        ((bm, bk), (M, K)), ((bk, bn), (K, N)),
        ((bm, 1), (M, 1)), ((1, bn), (1, N)), ((bm, bn), (M, N)),
    ):
        return int8_matmul_xla(
            xq, wq_all[layer], sx, sw_all[layer], out_dtype=out_dtype
        )

    grid = (M // bm, N // bn, K // bk)
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((1, bk, bn), lambda i, j, k: (layer, k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (layer, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, wq_all, sx, sw_all)


def int8_matmul_xla(
    xq: jax.Array,   # [M, K] int8
    wq: jax.Array,   # [K, N] int8
    sx: jax.Array,   # [M, 1] f32
    sw: jax.Array,   # [1, N] f32
    *,
    out_dtype=jnp.bfloat16,
    **_tile_kwargs,
) -> jax.Array:
    """Same math as `int8_matmul` via XLA's native int8 dot (bit-identical:
    the int32 dot is exact either way). Faster than the decode-tuned Pallas
    kernel at prefill/training shapes — measured 406 vs 234 TF/s at M=8192
    and 0.6-0.85x the Pallas time at M>=128 on v5e; the Pallas kernel wins
    at decode (M<=32, weight-HBM-bound)."""
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) / ((sx + _EPS) * (sw + _EPS))).astype(
        out_dtype
    )


# measured crossover on v5e (see int8_matmul_xla): below this row count the
# Pallas kernel's weight-bound tiling wins, above it XLA's int8 dot does
XLA_INT8_MIN_ROWS = 128


def _pad_rows(x: jax.Array, multiple: int) -> Tuple[jax.Array, int]:
    M = x.shape[0]
    pad = (-M) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, M


def w8a8_matmul(
    x: jax.Array,    # [M, K] fp activations
    wq: jax.Array,   # [K, N] int8 pre-quantized weights
    sw: jax.Array,   # [1, N] f32
    *,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,
) -> jax.Array:
    """Dynamic per-token activation quant + int8 matmul. Rows are padded to
    the tile multiple (decode steps have tiny M); large-M calls route to the
    XLA int8 dot (`int8_matmul_xla`) past the measured crossover."""
    xq, sx = quantize_per_token(x)
    if x.shape[0] >= XLA_INT8_MIN_ROWS:
        return int8_matmul_xla(xq, wq, sx, sw, out_dtype=out_dtype)
    xq, M = _pad_rows(xq, 32)
    sx, _ = _pad_rows(sx, 32)
    out = int8_matmul(xq, wq, sx, sw, out_dtype=out_dtype, bm=bm, bn=bn, bk=bk)
    return out[:M]


# ---------------------------------------------------------------------------
# int4 weight packing (two nibbles per int8 byte) for the W4 inference path
# ---------------------------------------------------------------------------


def pack_int4(q: jax.Array) -> jax.Array:
    """[K, N] int8 in [-8, 7] -> [K//2, N] uint8, split-half packed: row k of
    the top half K/2..K-1 rides in the high nibble of row k-K/2's byte.

    Split-half (not row-pair interleave) so the fused kernel's unpack is a
    sublane-contiguous concat instead of an interleave, and the two halves
    contract via two independent MXU dots. Integer accumulation is exact, so
    the K-order change cannot alter results."""
    assert q.shape[0] % 2 == 0
    kh = q.shape[0] // 2
    lo = (q[:kh].astype(jnp.uint8)) & 0xF
    hi = (q[kh:].astype(jnp.uint8)) & 0xF
    return (hi << 4 | lo).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> [K, N] int8 (sign-extended nibbles).
    Split-half layout makes this a concat — no interleave, no scatter."""
    p = packed.astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.int8)   # arithmetic sign-extend low nibble
    hi = ((p << 24) >> 28).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def quantize_weights_w4(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[K, N] fp -> (packed uint8 [K//2, N], scales [1, N]) at 4 bits."""
    q, s = quantize_per_channel(w, bits=4)
    return pack_int4(q), s


# ---------------------------------------------------------------------------
# Fused W4A8 kernel: nibbles stream from HBM, unpack in VMEM, int8 MXU dots
# ---------------------------------------------------------------------------


def _w4a8_matmul_kernel(x_lo_ref, x_hi_ref, wp_ref, sx_ref, sw_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # sign-extend nibbles via arithmetic shifts (no compare/select);
    # stacked-weight callers pass blocks with a leading singleton layer dim
    wp = wp_ref[:] if wp_ref.ndim == 2 else wp_ref[0]
    sw = sw_ref[:] if sw_ref.ndim == 2 else sw_ref[0]
    p = wp.astype(jnp.int32)
    w_lo = ((p << 28) >> 28).astype(jnp.int8)
    w_hi = ((p << 24) >> 28).astype(jnp.int8)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[:] += jax.lax.dot_general(
        x_lo_ref[:], w_lo, dimension_numbers=dn, preferred_element_type=jnp.int32
    )
    acc_ref[:] += jax.lax.dot_general(
        x_hi_ref[:], w_hi, dimension_numbers=dn, preferred_element_type=jnp.int32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        inv = 1.0 / ((sx_ref[:] + _EPS) * (sw + _EPS))
        out_ref[:] = (acc_ref[:].astype(jnp.float32) * inv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk"))
def int4_matmul(
    xq: jax.Array,        # [M, K] int8 (M multiple of 32)
    w_packed: jax.Array,  # [K//2, N] uint8, split-half packed
    sx: jax.Array,        # [M, 1] f32
    sw: jax.Array,        # [1, N] f32
    *,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,       # tile over K/2 (each packed row covers 2 K rows)
) -> jax.Array:
    """True-W4 matmul: packed weights are the only weight HBM traffic
    (half of int8); unpack runs on the VPU inside the kernel and feeds two
    int8 MXU contractions (low-half and high-half of K)."""
    M, K = xq.shape
    Kh, N = w_packed.shape
    assert K == 2 * Kh, (xq.shape, w_packed.shape)
    bm, bn, bk = _fit_tile(M, bm), _fit_tile(N, bn), _fit_tile(Kh, bk)
    bm, bn, bk = _shrink_to_vmem(
        M, N, Kh, bm, bn, bk, jnp.dtype(out_dtype).itemsize, x_tiles=2
    )
    if not _interpret() and not _mosaic_ok(
        ((bm, bk), (M, K)), ((bk, bn), (Kh, N)),
        ((bm, 1), (M, 1)), ((1, bn), (1, N)), ((bm, bn), (M, N)),
    ):
        return int8_matmul_xla(
            xq, unpack_int4(w_packed), sx, sw, out_dtype=out_dtype
        )
    nk = Kh // bk

    grid = (M // bm, N // bn, nk)
    return pl.pallas_call(
        _w4a8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bm, bk), lambda i, j, k, nk=nk: (i, k + nk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + Kh * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, xq, w_packed, sx, sw)


@functools.partial(
    jax.jit, static_argnames=("layer", "out_dtype", "bm", "bn", "bk")
)
def int4_matmul_stacked(
    xq: jax.Array,      # [M, K] int8 (M multiple of 32)
    wp_all: jax.Array,  # [L, K//2, N] uint8, split-half packed — WHOLE stack
    sx: jax.Array,      # [M, 1] f32
    sw_all: jax.Array,  # [L, 1, N] f32
    *,
    layer: int,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,
) -> jax.Array:
    """`int4_matmul` reading layer ``layer`` of the stacked packed weight in
    place (see `int8_matmul_stacked` for why: no XLA slice, no HBM copy)."""
    M, K = xq.shape
    L, Kh, N = wp_all.shape
    assert K == 2 * Kh and 0 <= layer < L, (xq.shape, wp_all.shape, layer)
    bm, bn, bk = _fit_tile(M, bm), _fit_tile(N, bn), _fit_tile(Kh, bk)
    bm, bn, bk = _shrink_to_vmem(
        M, N, Kh, bm, bn, bk, jnp.dtype(out_dtype).itemsize, x_tiles=2
    )
    if not _interpret() and not _mosaic_ok(
        ((bm, bk), (M, K)), ((bk, bn), (Kh, N)),
        ((bm, 1), (M, 1)), ((1, bn), (1, N)), ((bm, bn), (M, N)),
    ):
        return int8_matmul_xla(
            xq, unpack_int4(wp_all[layer]), sx, sw_all[layer],
            out_dtype=out_dtype,
        )
    nk = Kh // bk

    grid = (M // bm, N // bn, nk)
    return pl.pallas_call(
        _w4a8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bm, bk), lambda i, j, k, nk=nk: (i, k + nk)),
            pl.BlockSpec((1, bk, bn), lambda i, j, k: (layer, k, j)),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, 1, bn), lambda i, j, k: (layer, 0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + Kh * N + M * N * 2,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, xq, wp_all, sx, sw_all)


def w4a8_matmul(
    x: jax.Array,
    w_packed: jax.Array,  # [K//2, N] uint8
    sw: jax.Array,        # [1, N]
    *,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bn: int = 2048,
    bk: int = 1024,
) -> jax.Array:
    """Dynamic per-token activation quant + fused W4 matmul."""
    xq, sx = quantize_per_token(x)
    xq, M = _pad_rows(xq, 32)
    sx, _ = _pad_rows(sx, 32)
    out = int4_matmul(
        xq, w_packed, sx, sw, out_dtype=out_dtype, bm=bm, bn=bn, bk=bk
    )
    return out[:M]
