"""Trainer-level tests (SURVEY.md §4): KD loss semantics vs torch, loss
decreases over steps, grad-clip/optimizer wiring, sharded step runs."""

import numpy as np
import pytest
import dataclasses
import jax
import jax.numpy as jnp

from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.models import llama
from llm_qat_tpu.parallel import mesh as pmesh
from llm_qat_tpu.training import trainer as T


CFG = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=8)


def _batch(b=4, s=16, seed=0):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, CFG.vocab_size)
    return {"input_ids": ids, "labels": ids}


def test_kd_loss_matches_torch_kl_div():
    """Our KD loss must equal F.kl_div(log_softmax(S), softmax(T),
    reduction='batchmean') — sum/(batch size), kd_trainer.py:42-48."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    s = rng.standard_normal((3, 5, 17)).astype(np.float32)
    t = rng.standard_normal((3, 5, 17)).astype(np.float32)
    want = float(
        torch.nn.functional.kl_div(
            torch.log_softmax(torch.from_numpy(s), dim=2),
            torch.softmax(torch.from_numpy(t), dim=2),
            reduction="batchmean",
        )
    )
    got = float(T.kd_kl_loss(jnp.asarray(s), jnp.asarray(t)))
    assert abs(got - want) < 1e-5


def test_kd_loss_chunked_matches_unchunked():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.standard_normal((2, 8, 33)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((2, 8, 33)).astype(np.float32))
    a = float(T.kd_kl_loss(s, t))
    b = float(T.kd_kl_loss(s, t, chunk=4))
    assert abs(a - b) < 1e-4


def test_kd_loss_zero_when_same():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 4, 9)), jnp.float32)
    assert abs(float(T.kd_kl_loss(x, x))) < 1e-6


def test_train_loss_decreases():
    """A few KD steps on a tiny student/teacher must reduce the KD loss."""
    tcfg = T.TrainConfig(
        learning_rate=5e-3, total_steps=30, remat=False,
        compute_dtype=jnp.float32,
    )
    teacher_params = llama.init_params(CFG.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0))
    student_params = llama.init_params(CFG, jax.random.PRNGKey(1))
    tr = T.Trainer(CFG, tcfg, student_params, teacher_params)
    batch = _batch()
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(10)]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_vanilla_ce_train_no_teacher():
    """use_kd=False with teacher_params=None (the reference's vanilla
    training path, train.py:63-70) must train on label CE without tracing
    a teacher forward."""
    tcfg = T.TrainConfig(
        learning_rate=5e-3, total_steps=30, remat=False, use_kd=False,
        compute_dtype=jnp.float32,
    )
    tr = T.Trainer(CFG, tcfg, llama.init_params(CFG, jax.random.PRNGKey(1)))
    batch = _batch()
    losses = [float(tr.train_step(batch)["loss"]) for _ in range(10)]
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_eval_perplexity():
    tcfg = T.TrainConfig(compute_dtype=jnp.float32)
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    tr = T.Trainer(CFG, tcfg, params, teacher_params=None)
    m = tr.evaluate([_batch(seed=3)])
    assert m["perplexity"] == pytest.approx(np.exp(m["eval_loss"]))
    # random init on random tokens ~ uniform -> ppl near vocab size
    assert 0 < m["eval_loss"] < 2 * np.log(CFG.vocab_size)


@pytest.mark.slow
def test_sharded_train_step_matches_unsharded():
    """One KD step under the 8-device mesh == single-device step (x64)."""
    with jax.enable_x64(True):
        tcfg = T.TrainConfig(
            learning_rate=1e-3, total_steps=10, remat=False,
            compute_dtype=jnp.float64,
        )
        tp = llama.init_params(
            CFG.replace(w_bits=32, a_bits=32, kv_bits=32),
            jax.random.PRNGKey(0), dtype=jnp.float64,
        )
        sp = llama.init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float64)
        batch = _batch(b=8)

        copy = lambda t: jax.tree.map(jnp.copy, t)  # steps donate their state
        tr1 = T.Trainer(CFG, tcfg, copy(sp), tp)
        m1 = tr1.train_step(batch)

        mesh = pmesh.make_mesh(data=1, fsdp=4, tp=2)
        tr2 = T.Trainer(CFG, tcfg, copy(sp), tp, mesh=mesh)
        m2 = tr2.train_step(batch)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-8)
        # a handful of elements can land on a quantization rounding boundary
        # where fp32 sub-ops (norm/softmax) differ by reduction order; their
        # one-step update diff is bounded by ~lr. Real sharding bugs are O(1)
        # on most elements, so: >=99.9% of elements tight, stragglers < 2*lr.
        def close_enough(a, b):
            a, b = np.asarray(a), np.asarray(b)
            d = np.abs(a - b)
            tight = d <= 1e-6 + 1e-6 * np.abs(b)
            assert tight.mean() >= 0.999, f"only {tight.mean():.4%} tight"
            assert d.max() < 2 * tcfg.learning_rate, d.max()

        jax.tree.map(close_enough, tr1.state.params, tr2.state.params)


@pytest.mark.slow
def test_grad_accum_scaling():
    """loss reported under grad accum is scaled by 1/accum_steps
    (kd_trainer.py:112-114)."""
    tcfg1 = T.TrainConfig(remat=False, compute_dtype=jnp.float32)
    tcfg2 = T.TrainConfig(remat=False, compute_dtype=jnp.float32, grad_accum_steps=4)
    tp = llama.init_params(CFG.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0))
    sp = llama.init_params(CFG, jax.random.PRNGKey(1))
    b = _batch()
    copy = lambda t: jax.tree.map(jnp.copy, t)  # steps donate their state
    l1 = float(T.Trainer(CFG, tcfg1, copy(sp), tp).train_step(b)["loss"])
    l2 = float(T.Trainer(CFG, tcfg2, copy(sp), tp).train_step(b)["loss"])
    assert l2 == pytest.approx(l1 / 4, rel=1e-5)


@pytest.mark.slow
def test_chunked_kd_kl_matches_logits_path():
    """The head-fused chunked KL (no full-logits materialization) must equal
    kd_kl_loss on materialized logits, in value and in gradients."""
    cfg = CFG.replace(tie_word_embeddings=False)
    fp = cfg.replace(w_bits=32, a_bits=32, kv_bits=32)
    sp = llama.init_params(cfg, jax.random.PRNGKey(1))
    tp = llama.init_params(fp, jax.random.PRNGKey(0))
    ids = _batch(b=2, s=16)["input_ids"]

    teacher_h = llama.final_hidden(tp, fp, ids)
    teacher_head = llama.head_matrix(tp, fp)

    def loss_chunked(p):
        h = llama.final_hidden(p, cfg, ids)
        return T.chunked_kd_kl(
            h, teacher_h, llama.head_matrix(p, cfg), teacher_head, chunk=4
        )

    def loss_full(p):
        return T.kd_kl_loss(
            llama.forward(p, cfg, ids), llama.forward(tp, fp, ids)
        )

    l1, g1 = jax.value_and_grad(loss_chunked)(sp)
    l2, g2 = jax.value_and_grad(loss_full)(sp)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_trainer_chunked_kl_step_matches_unchunked():
    """Full train step with kl_chunk on vs off: same loss."""
    tp = llama.init_params(
        CFG.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0)
    )
    sp = llama.init_params(CFG, jax.random.PRNGKey(1))
    batch = _batch()
    copy = lambda t: jax.tree.map(jnp.copy, t)
    tcfg0 = T.TrainConfig(remat=False, compute_dtype=jnp.float32, kl_chunk=0)
    tcfg1 = T.TrainConfig(remat=False, compute_dtype=jnp.float32, kl_chunk=4)
    l0 = float(T.Trainer(CFG, tcfg0, copy(sp), tp).train_step(batch)["loss"])
    l1 = float(T.Trainer(CFG, tcfg1, copy(sp), tp).train_step(batch)["loss"])
    assert l1 == pytest.approx(l0, rel=1e-6)


def test_sharded_train_step_fused_flash_layout_path():
    """Regression: the round-5 fused flash-layout path (Pallas
    rmsnorm_quant + layout einsums) must compose with the FSDP/data mesh
    (Pallas custom calls under GSPMD). TINY_TEST's H=64 falls back to the
    unfused path, so this uses an H=128 fused-capable config."""
    from llm_qat_tpu.models.config import LlamaConfig
    from llm_qat_tpu.parallel import mesh as pmesh

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, w_bits=4, a_bits=8, kv_bits=4,
    )
    assert cfg.fused_norm_quant and cfg.use_flash_attention
    mesh = pmesh.make_mesh(data=2, fsdp=4, tp=1)
    tcfg = T.TrainConfig(total_steps=10, remat=True, compute_dtype=jnp.float32)
    teacher = llama.init_params(
        cfg.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0)
    )
    student = llama.init_params(cfg, jax.random.PRNGKey(1))
    tr = T.Trainer(cfg, tcfg, student, teacher, mesh=mesh)
    ids = jax.random.randint(jax.random.PRNGKey(2), (16, 16), 0, 256)
    m = tr.train_step({"input_ids": ids, "labels": ids})
    assert bool(jnp.isfinite(m["loss"]))


def test_fused_clip_adamw_matches_optax_chain():
    """fused_clip_adamw (round 5, single-pass) must reproduce the optax
    clip+adamw chain: same clip rule, moments, bias correction, schedule
    indexing, weight decay."""
    import numpy as np
    import optax

    tcfg = T.TrainConfig(
        learning_rate=3e-3, total_steps=12, weight_decay=0.01,
        max_grad_norm=0.5,
    )
    tx_f = T.make_optimizer(tcfg)
    tx_o = T.make_optimizer(dataclasses.replace(tcfg, fused_optimizer=False))

    key = jax.random.PRNGKey(0)
    params = {
        "a": jax.random.normal(key, (16, 32), jnp.float32),
        "b": {"w": jax.random.normal(jax.random.fold_in(key, 1), (8,), jnp.float32)},
    }
    pf = po = params
    sf, so = tx_f.init(pf), tx_o.init(po)
    for i in range(10):
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, 100 + i), p.shape)
            * (3.0 if i % 3 == 0 else 0.1),  # alternate clip-active/inactive
            params,
        )
        uf, sf = tx_f.update(g, sf, pf)
        pf = optax.apply_updates(pf, uf)
        uo, so = tx_o.update(g, so, po)
        po = optax.apply_updates(po, uo)
    for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(po)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
