"""Model-level tests (SURVEY.md §4 "Model-level"): forward parity with the
upstream torch reference on a tiny config, w=a=kv=32 equivalence, KV-quant
hook placement, cached vs uncached decode equivalence, GQA, loss."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_qat_tpu.models.config import TINY_TEST, LlamaConfig
from llm_qat_tpu.models import llama

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

# MHA tiny config for reference parity (reference predates GQA).
MHA_CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=64,
)


def make_params(cfg, seed=0):
    return llama.init_params(cfg, jax.random.PRNGKey(seed))


def test_forward_shapes_and_finite():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    params = make_params(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size)
    logits = llama.forward(params, cfg, ids)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_fp32_bits_equal_unquantized():
    """w=a=kv=32 must bit-match the plain model (same code path skips quant)."""
    cfg_q = TINY_TEST.replace(w_bits=32, a_bits=32, kv_bits=32)
    params = make_params(cfg_q)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, cfg_q.vocab_size)
    a = llama.forward(params, cfg_q, ids)
    b = llama.forward(params, TINY_TEST, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantization_changes_output():
    params = make_params(TINY_TEST)
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 8), 0, TINY_TEST.vocab_size)
    a = llama.forward(params, TINY_TEST, ids)
    b = llama.forward(params, TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4), ids)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_matches_no_remat():
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    params = make_params(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, cfg.vocab_size)

    def loss(p, remat):
        return jnp.sum(llama.forward(p, cfg, ids, remat=remat) ** 2) * 1e-6

    g1 = jax.grad(lambda p: loss(p, False))(params)
    g2 = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        g1,
        g2,
    )


def test_padding_mask():
    """Padded positions must not influence earlier (causal) positions'
    logits... and masked-out keys must not affect valid queries."""
    cfg = TINY_TEST
    params = make_params(cfg)
    ids_short = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 0, cfg.vocab_size)
    pad = jnp.full((1, 2), 7, jnp.int32)
    ids_long = jnp.concatenate([ids_short, pad], axis=1)
    mask = jnp.concatenate([jnp.ones((1, 6)), jnp.zeros((1, 2))], axis=1)
    a = llama.forward(params, cfg, ids_short)
    b = llama.forward(params, cfg, ids_long, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b[:, :6]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_cached_decode_matches_full_forward():
    """Prefill + token-by-token decode must reproduce the full-sequence
    forward (reference generation path, modeling_llama_quant.py:909-954)."""
    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    params = make_params(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 10), 0, cfg.vocab_size)
    full = llama.forward(params, cfg, ids)

    cache = llama.init_cache(cfg, batch=2, max_len=16)
    # prefill first 6
    logits_p, cache = llama.forward_with_cache(params, cfg, ids[:, :6], cache)
    np.testing.assert_allclose(
        np.asarray(full[:, :6]), np.asarray(logits_p), rtol=2e-4, atol=2e-4
    )
    # decode the remaining 4 one at a time
    for t in range(6, 10):
        step, cache = llama.forward_with_cache(params, cfg, ids[:, t : t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(full[:, t]), np.asarray(step[:, 0]), rtol=2e-4, atol=2e-4
        )


def test_loss_matches_manual():
    logits = jax.random.normal(jax.random.PRNGKey(7), (2, 5, 11))
    labels = jax.random.randint(jax.random.PRNGKey(8), (2, 5), 0, 11)
    got = float(llama.causal_lm_loss(logits, labels))
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    want = float(
        -jnp.mean(
            jnp.take_along_axis(lp, labels[:, 1:, None], axis=-1)
        )
    )
    assert abs(got - want) < 1e-5


@pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")
class TestTorchModelParity:
    """Elementwise logits parity against the upstream quantized LLaMA."""

    @classmethod
    def setup_class(cls):
        import sys

        sys.path.insert(0, REF)
        import torch

        from models.configuration_llama import LlamaConfig as RefConfig
        from models.modeling_llama_quant import LlamaForCausalLM as RefModel

        torch.manual_seed(0)
        cls.torch = torch
        cls.RefConfig = RefConfig
        cls.RefModel = RefModel

    def _build(self, w_bits, a_bits, kv_bits):
        torch = self.torch
        c = MHA_CFG.replace(w_bits=w_bits, a_bits=a_bits, kv_bits=kv_bits)
        rc = self.RefConfig(
            vocab_size=c.vocab_size,
            hidden_size=c.hidden_size,
            intermediate_size=c.intermediate_size,
            num_hidden_layers=c.num_hidden_layers,
            num_attention_heads=c.num_attention_heads,
            max_position_embeddings=c.max_position_embeddings,
            w_bits=w_bits,
            a_bits=a_bits,
        )
        rc.kv_bits = kv_bits  # monkey-patched like train.py:51-54
        ref = self.RefModel(rc).eval().float()

        # copy torch weights -> our pytree ([out,in] -> [in,out])
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        L = c.num_hidden_layers

        def stack(fmt, transpose=True):
            ws = [sd[fmt.format(i)] for i in range(L)]
            ws = [w.T if transpose else w for w in ws]
            return jnp.asarray(np.stack(ws))

        params = {
            "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
            "layers": {
                "attn_norm": stack("model.layers.{}.input_layernorm.weight", False),
                "q": stack("model.layers.{}.self_attn.q_proj.weight"),
                "k": stack("model.layers.{}.self_attn.k_proj.weight"),
                "v": stack("model.layers.{}.self_attn.v_proj.weight"),
                "o": stack("model.layers.{}.self_attn.o_proj.weight"),
                "mlp_norm": stack(
                    "model.layers.{}.post_attention_layernorm.weight", False
                ),
                "gate": stack("model.layers.{}.mlp.gate_proj.weight"),
                "up": stack("model.layers.{}.mlp.up_proj.weight"),
                "down": stack("model.layers.{}.mlp.down_proj.weight"),
            },
            "final_norm": jnp.asarray(sd["model.norm.weight"]),
            "lm_head": jnp.asarray(sd["lm_head.weight"].T),
        }
        return c, ref, params

    @pytest.mark.parametrize(
        "bits",
        [(32, 32, 32), (8, 8, 8), (4, 8, 4), (4, 6, 16), (2, 32, 32), (1, 32, 32)],
    )
    def test_logits_parity(self, bits):
        torch = self.torch
        c, ref, params = self._build(*bits)
        rng = np.random.default_rng(11)
        ids = rng.integers(0, c.vocab_size, (2, 9))
        with torch.no_grad():
            want = ref(torch.from_numpy(ids)).logits.numpy()
        got = np.asarray(llama.forward(params, c, jnp.asarray(ids, jnp.int32)))
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

    def test_grad_parity_smoke(self):
        """KD-style gradient of sum(logits^2) must match torch autograd
        through the STE quantizers."""
        torch = self.torch
        c, ref, params = self._build(4, 8, 4)
        rng = np.random.default_rng(12)
        ids = rng.integers(0, c.vocab_size, (1, 7))

        tids = torch.from_numpy(ids)
        out = ref(tids).logits
        (out.float() ** 2).sum().mul(1e-3).backward()
        want = ref.model.layers[0].self_attn.q_proj.weight.grad.numpy()

        def loss(p):
            lg = llama.forward(p, c, jnp.asarray(ids, jnp.int32))
            return jnp.sum(lg**2) * 1e-3

        g = jax.grad(loss)(params)
        got = np.asarray(g["layers"]["q"][0]).T  # [in,out] -> [out,in]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_sequence_classification():
    """Classifier head parity behaviors: pooling at last non-pad token,
    CE/MSE dispatch (reference modeling_llama_quant.py:970-1050)."""
    cfg = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
    params = llama.init_classifier_params(cfg, jax.random.PRNGKey(0), num_labels=3)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 1, cfg.vocab_size)
    out = llama.classify(params, cfg, ids)
    assert out.shape == (2, 3)

    # pooling: padding after position 6 must not change the pooled logits
    pad = 0
    ids_padded = jnp.concatenate(
        [ids[:, :7], jnp.full((2, 3), pad, jnp.int32)], axis=1
    )
    mask = (ids_padded != pad).astype(jnp.int32)
    a = llama.classify(
        params, cfg, ids[:, :7], pad_token_id=pad, attention_mask=jnp.ones((2, 7))
    )
    b = llama.classify(
        params, cfg, ids_padded, pad_token_id=pad, attention_mask=mask
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    labels = jnp.asarray([0, 2])
    ce = llama.classification_loss(out, labels)
    assert np.isfinite(float(ce))
    reg = llama.classification_loss(out[:, :1], jnp.asarray([0.5, -1.0]))
    assert np.isfinite(float(reg))


def test_kd_mse_loss_type():
    from llm_qat_tpu.training import trainer as T

    cfg = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
    tcfg = T.TrainConfig(
        learning_rate=5e-3, remat=False, compute_dtype=jnp.float32,
        kd_loss_type="mse",
    )
    tp = llama.init_params(cfg.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0))
    sp = llama.init_params(cfg, jax.random.PRNGKey(1))
    tr = T.Trainer(cfg, tcfg, sp, tp)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "labels": ids}
    l0 = float(tr.train_step(batch)["loss"])
    for _ in range(5):
        m = tr.train_step(batch)
    assert float(m["loss"]) < l0
