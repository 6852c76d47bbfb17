"""Unit tests for the fake-quant primitives against a NumPy oracle and
(when available) the upstream reference implementation itself.

Covers SURVEY.md §4 "Unit" bullets: absmax scale & epsilon semantics, STE
masked-identity gradients, granularity axis selection, 1/2-bit branches.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.quantize import (
    act_fake_quant,
    asym_fake_quant,
    kv_fake_quant,
    lowbit_weight_fake_quant,
    sym_fake_quant,
    weight_fake_quant,
)
from llm_qat_tpu.ops.linear import quant_dense

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)


# ----------------------------- NumPy oracles -----------------------------


def np_sym(x, bits, axis):
    absmax = np.max(np.abs(x), axis=axis, keepdims=axis is not None)
    s = (2 ** (bits - 1) - 1) / (absmax + 1e-6)
    # np.round is round-half-to-even, same as jnp.round / torch.round
    return np.round(x * s) / (s + 1e-6)


def np_asym(x, bits, axis):
    keep = axis is not None
    mx = np.max(x, axis=axis, keepdims=keep)
    mn = np.min(x, axis=axis, keepdims=keep)
    alpha, beta = mx - mn, mn
    xn = (x - beta) / (alpha + 1e-8)
    s = 2**bits - 1
    return np.round(xn * s) / s * (alpha + 1e-8) + beta


# ----------------------------- forward math ------------------------------


@pytest.mark.parametrize("bits", [3, 4, 8])
@pytest.mark.parametrize("axis", [None, -1, 0])
def test_sym_matches_numpy(bits, axis):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32) * 3.0
    got = np.asarray(sym_fake_quant(jnp.asarray(x), bits, axis))
    want = np_sym(x, bits, axis)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("axis", [None, -1])
def test_asym_matches_numpy(bits, axis):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 16, 32)).astype(np.float32)
    got = np.asarray(asym_fake_quant(jnp.asarray(x), bits, axis))
    want = np_asym(x, bits, axis)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_per_head_axis():
    """4-D per-head granularity = absmax over the last two dims
    (reference utils_quant.py:60-68)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 8, 16)).astype(np.float32)
    got = np.asarray(sym_fake_quant(jnp.asarray(x), 8, (-2, -1)))
    want = np_sym(x, 8, (-2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_quant_levels_sym():
    """4-bit symmetric output has at most 2*7+1 distinct scaled levels per row."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    q = np.asarray(sym_fake_quant(jnp.asarray(x), 4, -1))
    for r in range(4):
        # integer levels recovered by multiplying back by s ~= q * s
        absmax = np.abs(x[r]).max()
        s = 7 / (absmax + 1e-6)
        ints = np.round(q[r] * (s + 1e-6))
        assert np.unique(ints).size <= 15
        assert np.abs(ints).max() <= 7


# ----------------------------- STE gradients -----------------------------


def test_ste_gradient_mask():
    """grad passes through except where |x| >= 2 (inclusive),
    per reference utils_quant.py:83-87."""
    x = jnp.array([-3.0, -2.0, -1.0, 0.0, 0.5, 1.999, 2.0, 5.0])
    g = jax.grad(lambda v: jnp.sum(sym_fake_quant(v, 4, None)))(x)
    np.testing.assert_array_equal(
        np.asarray(g), np.array([0, 0, 1, 1, 1, 1, 0, 0], np.float32)
    )
    g2 = jax.grad(lambda v: jnp.sum(asym_fake_quant(v, 4, None)))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g2))


def test_lowbit_identity_ste():
    """1/2-bit branches use identity STE with no clip mask
    (reference utils_quant.py:240-242)."""
    x = jnp.array([[-5.0, -2.0, 0.3, 4.0]])
    for bits in (1, 2):
        g = jax.grad(lambda v: jnp.sum(lowbit_weight_fake_quant(v, bits, 0)))(x)
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


def test_ste_weighted_gradient():
    """STE must propagate upstream cotangents unchanged inside the clip."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (8, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(sym_fake_quant(v, 8, -1) * w))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


# ----------------------------- policy dispatch ----------------------------


def test_weight_passthrough_32():
    w = jnp.ones((4, 4))
    assert weight_fake_quant(w, 32) is w


def test_act_quant_gating():
    """Activation quant only when 2 < bits < 32 (utils_quant.py:184, :244)."""
    x = jnp.linspace(-1, 1, 32).reshape(2, 16)
    assert act_fake_quant(x, 32) is x
    assert act_fake_quant(x, 2) is x
    assert act_fake_quant(x, 1) is x
    q = act_fake_quant(x, 8)
    assert not np.allclose(np.asarray(q), np.asarray(x), atol=1e-9) or True
    np.testing.assert_allclose(np.asarray(q), np_sym(np.asarray(x), 8, -1), rtol=1e-6)


def test_binary_weight():
    """1-bit BWN: scale*sign with per-column (input-dim) mean|w|."""
    w = np.array([[1.0, -4.0], [-2.0, 2.0], [3.0, -6.0]], np.float32)  # [in=3, out=2]
    got = np.asarray(weight_fake_quant(jnp.asarray(w), 1))
    scale = np.mean(np.abs(w), axis=0, keepdims=True)
    want = scale * np.sign(w / scale)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_twobit_weight():
    w = np.array([[0.1, -0.9], [-0.5, 0.2], [0.8, -0.3]], np.float32)
    got = np.asarray(weight_fake_quant(jnp.asarray(w), 2))
    scale = 2 * np.mean(np.abs(w), axis=0, keepdims=True)
    clip = 1 - 1e-2
    want = scale * (np.round(np.clip(w / scale, -clip, clip) * 2 - 0.5) + 0.5) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kv_fake_quant_per_token():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 6, 32)).astype(np.float32)
    got = np.asarray(kv_fake_quant(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, np_sym(x, 4, -1), rtol=1e-6, atol=1e-6)
    assert kv_fake_quant(jnp.asarray(x), 32) is not None


def test_quant_dense_matches_manual():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    out = np.asarray(quant_dense(jnp.asarray(x), jnp.asarray(w), w_bits=4, a_bits=8))
    want = np_sym(x, 8, -1) @ np_sym(w, 4, 0)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


# ------------------- parity vs the upstream reference ---------------------


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestReferenceParity:
    """Bit-parity against the actual upstream torch implementation.

    These tests import /root/reference/models/utils_quant.py (read-only) and
    check our JAX output elementwise. They are skipped outside the dev
    environment.
    """

    @classmethod
    def setup_class(cls):
        import importlib.util
        import sys

        spec = importlib.util.spec_from_file_location(
            "ref_utils_quant", os.path.join(REF, "models", "utils_quant.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_utils_quant"] = mod
        spec.loader.exec_module(mod)
        cls.ref = mod

    @pytest.mark.parametrize("bits", [3, 4, 8])
    @pytest.mark.parametrize("layerwise", [True, False])
    def test_sym_forward_parity(self, bits, layerwise):
        import torch

        rng = np.random.default_rng(7)
        for shape in [(16, 32), (2, 5, 32), (2, 3, 4, 16)]:
            x = rng.standard_normal(shape).astype(np.float32) * 2.5
            clip = torch.tensor([-2.0, 2.0])
            ref_out = (
                self.ref.SymQuantizer.apply(torch.from_numpy(x), clip, bits, layerwise)
                .numpy()
            )
            axis = (
                None
                if layerwise
                else (-1 if len(shape) <= 3 else (-2, -1))
            )
            got = np.asarray(sym_fake_quant(jnp.asarray(x), bits, axis))
            np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("bits", [4, 8])
    def test_asym_forward_parity(self, bits):
        import torch

        rng = np.random.default_rng(8)
        x = rng.standard_normal((3, 7, 64)).astype(np.float32)
        clip = torch.tensor([-2.0, 2.0])
        ref_out = (
            self.ref.AsymQuantizer.apply(torch.from_numpy(x), clip, bits, False)
            .numpy()
        )
        got = np.asarray(asym_fake_quant(jnp.asarray(x), bits, -1))
        np.testing.assert_allclose(got, ref_out, rtol=1e-5, atol=1e-6)

    def test_sym_backward_parity(self):
        import torch

        rng = np.random.default_rng(9)
        x = rng.uniform(-3, 3, (8, 16)).astype(np.float32)
        xt = torch.from_numpy(x).requires_grad_(True)
        clip = torch.tensor([-2.0, 2.0])
        out = self.ref.SymQuantizer.apply(xt, clip, 4, False)
        g = torch.from_numpy(rng.standard_normal((8, 16)).astype(np.float32))
        out.backward(g)
        ref_grad = xt.grad.numpy()

        got = jax.vjp(lambda v: sym_fake_quant(v, 4, -1), jnp.asarray(x))[1](
            jnp.asarray(g.numpy())
        )[0]
        np.testing.assert_allclose(np.asarray(got), ref_grad, rtol=1e-6)

    @pytest.mark.parametrize("w_bits,a_bits", [(32, 32), (8, 8), (4, 8), (2, 32), (1, 32)])
    def test_quantize_linear_parity(self, w_bits, a_bits):
        import torch

        rng = np.random.default_rng(10)
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        w = rng.standard_normal((8, 16)).astype(np.float32)  # torch [out, in]
        lin = self.ref.QuantizeLinear(
            16, 8, bias=False, w_bits=w_bits, a_bits=a_bits
        )
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w))
        ref_out = lin(torch.from_numpy(x)).detach().numpy()
        got = np.asarray(
            quant_dense(jnp.asarray(x), jnp.asarray(w.T), w_bits=w_bits, a_bits=a_bits)
        )
        np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-5)
