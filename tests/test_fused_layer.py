"""Producer-fused norm/silu quant blocks: parity with the unfused path.

The fused blocks (ops/fused_layer.py) must reproduce the exact composition
``rms_norm -> act_fake_quant -> int8 matmul`` (resp. ``silu*up -> ...``)
in forward AND gradients (reference STE semantics, utils_quant.py:77-87).
On CPU the Pallas kernels run in interpreter mode, so the comparison is
against the same math — tolerances cover only reduction-order slack.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.ops import fused_layer
from llm_qat_tpu.ops.linear import quant_dense
from llm_qat_tpu.ops.pallas import fused_quant

M, H, I = 32, 256, 384


def _ref_norm_dense(h, g, ws, w_bits, a_bits, eps):
    x = llama.rms_norm(h, g, eps)
    return tuple(
        quant_dense(x, w, w_bits=w_bits, a_bits=a_bits, fused=True) for w in ws
    )


def _ref_silu_mul_dense(gate, up, w, w_bits, a_bits):
    return quant_dense(
        jax.nn.silu(gate) * up, w, w_bits=w_bits, a_bits=a_bits, fused=True
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_norm_dense_forward(dtype):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((M, H)), dtype)
    g = jnp.asarray(rng.uniform(0.5, 1.5, (H,)), jnp.float32)
    ws = tuple(
        jnp.asarray(rng.standard_normal((H, n)) * 0.1, jnp.float32)
        for n in (128, 256)
    )
    got = fused_layer.fused_norm_dense(h, g, ws, w_bits=4, a_bits=8, eps=1e-6)
    want = _ref_norm_dense(h, g, ws, 4, 8, 1e-6)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    for a, b in zip(got, want):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=tol, atol=tol,
        )


def test_norm_dense_leading_dims():
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.standard_normal((2, 16, H)), jnp.float32)
    g = jnp.ones((H,), jnp.float32)
    w = jnp.asarray(rng.standard_normal((H, 128)) * 0.1, jnp.float32)
    (got,) = fused_layer.fused_norm_dense(h, g, (w,), w_bits=8, a_bits=8, eps=1e-6)
    (want,) = _ref_norm_dense(h, g, (w,), 8, 8, 1e-6)
    assert got.shape == (2, 16, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_norm_dense_grads():
    rng = np.random.default_rng(2)
    # inputs spanning the +-2 STE clip boundary so the masks are exercised
    h = jnp.asarray(rng.uniform(-3, 3, (M, H)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.5, 1.5, (H,)), jnp.float32)
    ws = tuple(
        jnp.asarray(rng.uniform(-3, 3, (H, n)) * 0.8, jnp.float32)
        for n in (128, 128)
    )

    def loss_fused(h, g, ws):
        outs = fused_layer.fused_norm_dense(h, g, ws, w_bits=4, a_bits=8, eps=1e-6)
        return sum(jnp.sum(o**2) for o in outs) * 1e-3

    def loss_ref(h, g, ws):
        outs = _ref_norm_dense(h, g, ws, 4, 8, 1e-6)
        return sum(jnp.sum(o**2) for o in outs) * 1e-3

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(h, g, ws)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(h, g, ws)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )
    # STE: latent weights outside +-2 get exactly zero grad
    for dw, w in zip(g1[2], ws):
        assert (np.asarray(dw)[np.abs(np.asarray(w)) >= 2] == 0).all()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_silu_mul_dense_forward(dtype):
    rng = np.random.default_rng(3)
    gate = jnp.asarray(rng.standard_normal((M, I)), dtype)
    up = jnp.asarray(rng.standard_normal((M, I)), dtype)
    w = jnp.asarray(rng.standard_normal((I, H)) * 0.1, dtype)
    got = fused_layer.fused_silu_mul_dense(gate, up, w, w_bits=4, a_bits=8)
    want = _ref_silu_mul_dense(gate, up, w, 4, 8)
    if dtype == jnp.float32:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )
    else:
        # bf16: the kernel's fp32-sigmoid-then-round differs from XLA's
        # bf16 silu by <=1 ulp, which can flip a round() at an integer
        # boundary — a legitimate 1-lsb quant difference. Bound the error
        # by one activation quant step propagated through the matmul.
        y = jax.nn.silu(gate) * up
        step = np.asarray(
            jnp.max(jnp.abs(y.astype(jnp.float32)), axis=-1, keepdims=True)
        ) / 127.0
        # a handful of flips can land in the same output dot, so bound the
        # worst case by a few steps and require the bulk to be tight
        bound = step * np.abs(np.asarray(w, np.float32)).max() * 6.0 + 1e-2
        diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
        assert (diff <= bound).all(), (diff.max(), bound.min())


def test_silu_mul_dense_grads():
    rng = np.random.default_rng(4)
    gate = jnp.asarray(rng.uniform(-4, 4, (M, I)), jnp.float32)
    up = jnp.asarray(rng.uniform(-1, 1, (M, I)), jnp.float32)
    w = jnp.asarray(rng.uniform(-3, 3, (I, H)) * 0.8, jnp.float32)

    def loss_fused(gate, up, w):
        return jnp.sum(fused_layer.fused_silu_mul_dense(
            gate, up, w, w_bits=4, a_bits=8) ** 2) * 1e-3

    def loss_ref(gate, up, w):
        return jnp.sum(_ref_silu_mul_dense(gate, up, w, 4, 8) ** 2) * 1e-3

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(gate, up, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(gate, up, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )
    assert (np.asarray(g1[2])[np.abs(np.asarray(w)) >= 2] == 0).all()


def test_supported_gate():
    x_ok = jnp.zeros((32, 256), jnp.bfloat16)
    x_lane = jnp.zeros((32, 192), jnp.bfloat16)   # K % 128 != 0
    x_row = jnp.zeros((30, 256), jnp.bfloat16)    # M % 8 != 0
    assert fused_layer.supported(x_ok, 4, 8)
    assert not fused_layer.supported(x_lane, 4, 8)
    assert not fused_layer.supported(x_row, 4, 8)
    assert not fused_layer.supported(x_ok, 2, 8)   # sub-3-bit branch
    assert not fused_layer.supported(x_ok, 4, 32)  # fp activations


# model-level: fused_norm_quant on/off must agree (fused-capable shape)
_CFG = LlamaConfig(
    vocab_size=128, hidden_size=128, intermediate_size=256,
    num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
    max_position_embeddings=64, w_bits=4, a_bits=8, kv_bits=4,
)


def test_model_fused_norm_quant_matches():
    cfg_off = _CFG.replace(fused_norm_quant=False)
    params = llama.init_params(_CFG, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, _CFG.vocab_size)
    a = np.asarray(llama.forward(params, _CFG, ids))
    b = np.asarray(llama.forward(params, cfg_off, ids))
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)

    g1 = jax.grad(lambda p: jnp.sum(llama.forward(p, _CFG, ids) ** 2) * 1e-4)(params)
    g2 = jax.grad(lambda p: jnp.sum(llama.forward(p, cfg_off, ids) ** 2) * 1e-4)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_model_fused_norm_quant_remat_matches():
    cfg_off = _CFG.replace(fused_norm_quant=False)
    params = llama.init_params(_CFG, jax.random.PRNGKey(2))
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, _CFG.vocab_size)

    def loss(p, cfg):
        return jnp.sum(
            llama.forward(p, cfg, ids, remat=True) ** 2
        ) * 1e-4

    g1 = jax.grad(loss)(params, _CFG)
    g2 = jax.grad(loss)(params, cfg_off)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )


def test_kernels_direct():
    """Pallas kernels against the plain jnp composition."""
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.5, 1.5, (128,)), jnp.float32)
    xq, sx = fused_quant.rmsnorm_quant(h, g, 1e-6, 8)
    xn = llama.rms_norm(h, g, 1e-6)
    absmax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
    s = 127.0 / (absmax + 1e-6)
    np.testing.assert_array_equal(
        np.asarray(xq), np.asarray(jnp.round(xn * s).astype(jnp.int8))
    )
    np.testing.assert_allclose(np.asarray(sx), np.asarray(s), rtol=1e-6)

    gate = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    up = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    yq, sy = fused_quant.silu_mul_quant(gate, up, 8)
    y = jax.nn.silu(gate) * up
    am = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s2 = 127.0 / (am + 1e-6)
    np.testing.assert_array_equal(
        np.asarray(yq), np.asarray(jnp.round(y * s2).astype(jnp.int8))
    )
    np.testing.assert_allclose(np.asarray(sy), np.asarray(s2), rtol=1e-6)
