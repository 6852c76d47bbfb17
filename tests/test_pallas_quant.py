"""Pallas int8/int4 matmul kernel tests (interpreter mode on CPU).

Numerics gate: the true-int path must reproduce the fake-quant reference
math (`sym_fake_quant(x) @ sym_fake_quant(w)`) to fp tolerance — SURVEY.md §7
step 1 "Pallas fused kernel ... numerics-gated against the reference path".
"""

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.pallas import quant_matmul as QM
from llm_qat_tpu.ops.quantize import sym_fake_quant


def test_quantize_per_token_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    q, s = QM.quantize_per_token(x)
    assert q.dtype == jnp.int8 and s.shape == (8, 1)
    deq = q.astype(jnp.float32) / (s + 1e-6)
    fake = sym_fake_quant(x, 8, -1)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(fake), atol=1e-6)


def test_int8_matmul_matches_fake_quant():
    rng = np.random.default_rng(1)
    M, K, N = 64, 128, 128
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    xq, sx = QM.quantize_per_token(x)
    wq, sw = QM.quantize_per_channel(w)
    got = QM.int8_matmul(xq, wq, sx, sw, out_dtype=jnp.float32, bm=32, bn=64, bk=64)
    want = np.asarray(sym_fake_quant(x, 8, -1)) @ np.asarray(sym_fake_quant(w, 8, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_w8a8_matmul_pads_small_m():
    """Decode-sized M (not tile-aligned) must work via padding."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    wq, sw = QM.quantize_per_channel(w)
    got = QM.w8a8_matmul(x, wq, sw, out_dtype=jnp.float32, bn=64, bk=64)
    assert got.shape == (3, 64)
    want = np.asarray(sym_fake_quant(x, 8, -1)) @ np.asarray(sym_fake_quant(w, 8, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_int4_pack_unpack_roundtrip():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.integers(-8, 8, (16, 32)).astype(np.int8))
    packed = QM.pack_int4(q)
    assert packed.shape == (8, 32) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(QM.unpack_int4(packed)), np.asarray(q))


def test_w4a8_matches_fake_quant():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((32, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    w_packed, sw = QM.quantize_weights_w4(w)
    got = QM.w4a8_matmul(x, w_packed, sw, out_dtype=jnp.float32, bn=64, bk=64)
    want = np.asarray(sym_fake_quant(x, 8, -1)) @ np.asarray(sym_fake_quant(w, 4, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
