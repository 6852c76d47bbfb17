"""Quantized dense (linear) op — the `QuantizeLinear` equivalent.

Reference: models/utils_quant.py:165-255 (`QuantizeLinear(nn.Linear)`), which
fake-quants the weight per-output-channel, optionally fake-quants the
activation per-token, then calls ``F.linear`` with bias forced off
(utils_quant.py:176).

Here it is a pure function over a ``[in, out]`` weight so the matmul is
``x @ w`` (row-major activations hitting the MXU with the contraction on the
last/ first dims — the natural TPU layout, no transpose needed). XLA fuses the
quantize-dequantize elementwise chain into the matmul; a hand-fused Pallas
path is available via ``use_pallas=True`` once `ops.pallas.quant_matmul`
lands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.quantize import act_fake_quant, weight_fake_quant


def quant_dense(
    x: jax.Array,
    w: jax.Array,
    *,
    w_bits: int = 32,
    a_bits: int = 32,
    symmetric: bool = True,
    act_layerwise: bool = False,
    weight_layerwise: bool = False,
    preferred_dtype=None,
    fused: bool = False,
) -> jax.Array:
    """``act_quant(x) @ weight_quant(w)`` with no bias.

    Mirrors QuantizeLinear.forward (utils_quant.py:190-254): weight path by
    ``w_bits`` (passthrough / sym per-channel / 1-2-bit branches), activation
    quantized only when ``2 < a_bits < 32``.

    ``fused=True`` routes supported symmetric per-channel/per-token configs
    (3<=w<=8, 2<a<=8) through the int8-MXU fused kernel with identical STE
    gradients (ops/pallas/qat_matmul.py).
    """
    if (
        fused
        and symmetric
        and not act_layerwise
        and not weight_layerwise
    ):
        from llm_qat_tpu.ops.pallas.qat_matmul import fused_quant_matmul, supported

        if supported(w_bits, a_bits):
            return fused_quant_matmul(x, w, w_bits, a_bits)
    wq = weight_fake_quant(w, w_bits, layerwise=weight_layerwise)
    xq = act_fake_quant(x, a_bits, symmetric=symmetric, layerwise=act_layerwise)
    return jnp.matmul(xq, wq, preferred_element_type=preferred_dtype)
