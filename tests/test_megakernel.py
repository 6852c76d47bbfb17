"""Whole-model decode megakernel (inference/megakernel.py): parity with the
scan serving path — logits and the exact committed cache integers."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST

from tests.serving_helpers import _prefilled

# megakernel needs NC | {H, Dq, 2I}: TINY_TEST dims already satisfy this on
# the interpret path (NC becomes the gcd). use_megakernel defaults ON since
# round 4 — the "scan side" of every parity test must opt OUT explicitly.
CFG_BASE = TINY_TEST.replace(
    w_bits=8, a_bits=8, kv_bits=8, use_megakernel=False
)


@pytest.mark.parametrize("rope_mode", ["pre", "post"])
def test_megakernel_matches_scan_decode(rope_mode):
    cfg = CFG_BASE.replace(kv_cache_rope=rope_mode)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 3, 32
    lens = [5, 11, 8]
    cache = _prefilled(cfg, qparams, b, max_len, lens)

    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.asarray([True, True, True])

    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    cfg_m = cfg.replace(use_megakernel=True)
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg_m, tok, cache["lengths"], active, cache,
        dtype=jnp.float32,
    )

    np.testing.assert_allclose(
        np.asarray(lg_meg), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )
    # committed integers must be EXACTLY the scan path's
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )
    for key in ("k_s", "v_s", "lengths"):
        np.testing.assert_allclose(
            np.asarray(c_meg[key]), np.asarray(c_scan[key]), rtol=1e-6
        )


def test_megakernel_inactive_and_empty_slots():
    """Inactive slots must not advance; empty+inactive slots must not
    poison the softmax accumulator."""
    cfg = CFG_BASE.replace(use_megakernel=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 3, 32
    cache = _prefilled(cfg.replace(use_megakernel=False), qparams, b,
                       max_len, [6, 4, 9])
    tok = jax.random.randint(jax.random.PRNGKey(3), (b, 1), 0, cfg.vocab_size)
    active = jnp.asarray([True, False, True])

    lg_meg, c_meg = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg.replace(use_megakernel=False), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(c_meg["lengths"]), np.asarray(c_scan["lengths"])
    )
    # logits parity for the ACTIVE slots (inactive slots' outputs are
    # discarded by the engine)
    for i in (0, 2):
        np.testing.assert_allclose(
            np.asarray(lg_meg[i]), np.asarray(lg_scan[i]),
            rtol=2e-4, atol=2e-4,
        )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )


@pytest.mark.slow
def test_megakernel_greedy_rollout_matches_scan():
    cfg = CFG_BASE
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 64

    def rollout(c):
        cache = _prefilled(c.replace(use_megakernel=False), qparams, b,
                           max_len, [7, 12])
        toks = jax.random.randint(
            jax.random.PRNGKey(5), (b, 1), 0, cfg.vocab_size
        )
        out = []
        active = jnp.ones((b,), bool)
        for _ in range(8):
            lg, cache = M.serving_forward(
                qparams, c, toks, cache["lengths"], active, cache,
                dtype=jnp.float32,
            )
            toks = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
            out.append(np.asarray(toks[:, 0]))
        return np.stack(out)

    t_scan = rollout(cfg)
    t_meg = rollout(cfg.replace(use_megakernel=True))
    np.testing.assert_array_equal(t_meg, t_scan)


def test_engine_with_megakernel_token_parity():
    """The continuous-batching engine must produce identical greedy tokens
    with the megakernel decode path enabled."""
    from llm_qat_tpu.inference import engine as E

    cfg = CFG_BASE
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, cfg.vocab_size, n)) for n in (9, 13)]

    def run(c):
        eng = E.InferenceEngine(qparams, c, max_batch=2, max_len=64,
                                dtype=jnp.float32)
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        return {r.uid: r.output for r in eng.run()}

    want = run(cfg)
    got = run(cfg.replace(use_megakernel=True))
    assert got == want


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_megakernel_w4_matches_scan(kv_bits):
    """W4 packed weights through the megakernel: split-half in-kernel
    unpack + two K-half int8 dots must match the scan path exactly (the
    int32 accumulation is exact, so K-order cannot matter). kv_bits=4
    runs with kv_cache_pack off here (the packed-cache composition has its
    own test below)."""
    cfg = TINY_TEST.replace(
        w_bits=4, a_bits=8, kv_bits=kv_bits, kv_cache_pack=False,
        use_megakernel=False,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    cache = _prefilled(cfg, qparams, b, max_len, [6, 11])
    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.ones((b,), bool)
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg_meg), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )


@pytest.mark.parametrize("kv_pack", [False, True])
def test_megakernel_batched_attention_matches_scan(kv_pack):
    """groups % 8 == 0 routes attention through the cross-head batched
    softmax (megakernel.batched_att, the b>=16 VPU-instruction fix —
    VERDICT r3 item 7); logits and committed integers must still match
    the scan path exactly."""
    cfg = TINY_TEST.replace(
        hidden_size=128, intermediate_size=128, num_attention_heads=16,
        num_key_value_heads=2,  # groups = 8 -> batched_att
        w_bits=4 if kv_pack else 8, a_bits=8,
        kv_bits=4 if kv_pack else 8, kv_cache_pack=kv_pack,
        use_megakernel=False,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 3, 32
    cache = _prefilled(cfg, qparams, b, max_len, [5, 11, 8])
    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.asarray([True, True, False])
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(lg_meg[i]), np.asarray(lg_scan[i]),
            rtol=2e-4, atol=2e-4,
        )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )


@pytest.mark.parametrize("rope_mode", ["pre", "post"])
def test_megakernel_packed_kv4_matches_scan(rope_mode):
    """The flagship composition (VERDICT r3 item 2): W4A8KV4 with the
    nibble-packed cache THROUGH the megakernel. The kernel streams the
    packed uint8 container, unpacks split-half nibbles in-register (the
    nibbles are exactly RoPE's rotate-half k1/k2 rows), and the commit
    packs the new column — logits and packed cache bytes must match the
    scan path, which has its own independent packed read/write path."""
    cfg = TINY_TEST.replace(
        w_bits=4, a_bits=8, kv_bits=4, kv_cache_pack=True,
        kv_cache_rope=rope_mode, use_megakernel=False,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 3, 32
    cache = _prefilled(cfg, qparams, b, max_len, [5, 11, 8])
    assert cache["k_q"].dtype == jnp.uint8  # packed container in play
    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.asarray([True, True, False])
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    for i in (0, 1):  # active slots (inactive outputs are discarded)
        np.testing.assert_allclose(
            np.asarray(lg_meg[i]), np.asarray(lg_scan[i]),
            rtol=2e-4, atol=2e-4,
        )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )
    for key in ("k_s", "v_s", "lengths"):
        np.testing.assert_allclose(
            np.asarray(c_meg[key]), np.asarray(c_scan[key]), rtol=1e-6
        )


@pytest.mark.parametrize("kv_bits,kv_pack", [(8, False), (4, True)])
def test_megakernel_mha_matches_scan(kv_bits, kv_pack):
    """MHA (groups=1 — the LLaMA-7B/13B head layout, VERDICT r4 next #1):
    the per-head attention path must stay parity-exact when every query
    head owns its KV head."""
    cfg = TINY_TEST.replace(
        w_bits=4, a_bits=8, kv_bits=kv_bits, kv_cache_pack=kv_pack,
        num_key_value_heads=4,  # == num_attention_heads -> MHA
        use_megakernel=False,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(3))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    cache = _prefilled(cfg, qparams, b, max_len, [7, 13])

    tok = jax.random.randint(jax.random.PRNGKey(9), (b, 1), 0, cfg.vocab_size)
    active = jnp.ones((b,), bool)
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg_meg), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )


@pytest.mark.parametrize("mode", ["gqa", "mha", "batched"])
def test_megakernel_kv_head_tiling_matches_scan(monkeypatch, mode):
    """KH < kvh (KV-head-tiled cache streaming — the VMEM lever that fits
    MHA/7B shapes, round 5) must be numerically identical to whole-head
    streaming, on the per-head AND the cross-head-batched softmax paths.
    Forced via _pick_nc_bk since tiny shapes never need it."""
    from llm_qat_tpu.inference import megakernel as MK

    kvh = {"gqa": 2, "mha": 4, "batched": 2}[mode]
    cfg = TINY_TEST.replace(
        w_bits=4, a_bits=8, kv_bits=4, num_key_value_heads=kvh,
        use_megakernel=False,
    )
    if mode == "batched":  # groups = 16/2 = 8 -> batched_att with NT=2
        cfg = cfg.replace(num_attention_heads=16, num_key_value_heads=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(5))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    cache = _prefilled(cfg, qparams, b, max_len, [6, 12])
    tok = jax.random.randint(jax.random.PRNGKey(11), (b, 1), 0, cfg.vocab_size)
    active = jnp.ones((b,), bool)
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )

    orig = MK._pick_nc_bk
    monkeypatch.setattr(
        MK, "_pick_nc_bk", lambda c, bb, s: (orig(c, bb, s)[0], orig(c, bb, s)[1], kvh // 2)
    )
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg_meg), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )
    for key in ("k_q", "v_q"):
        np.testing.assert_array_equal(
            np.asarray(c_meg[key]), np.asarray(c_scan[key])
        )


def test_megakernel_mha_rep_batched_matches_scan():
    """MHA with KH % 8 == 0 routes through the row-replicated batched
    softmax (rep=8, round 5): each head's query replicates to 8 sublane
    rows so the whole tile shares one masked max/exp/sum. Parity against
    the scan path at a shape where the path actually engages."""
    from llm_qat_tpu.inference import megakernel as MK

    cfg = TINY_TEST.replace(
        hidden_size=512, intermediate_size=512,
        num_attention_heads=8, num_key_value_heads=8,  # MHA, kvh=8
        w_bits=4, a_bits=8, kv_bits=4,
        use_megakernel=False,
    )
    nc, bk, kh = MK._pick_nc_bk(cfg, 2, 32)
    assert kh % 8 == 0, (nc, bk, kh)  # rep path must engage
    params = llama.init_params(cfg, jax.random.PRNGKey(11))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    cache = _prefilled(cfg, qparams, b, max_len, [9, 17])

    tok = jax.random.randint(jax.random.PRNGKey(12), (b, 1), 0, cfg.vocab_size)
    active = jnp.ones((b,), bool)
    lg_scan, c_scan = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    cache2 = _prefilled(cfg, qparams, b, max_len, [9, 17])
    lg_meg, c_meg = M.serving_forward(
        qparams, cfg.replace(use_megakernel=True), tok, cache["lengths"],
        active, cache2, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg_meg), np.asarray(lg_scan), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(c_meg["k_q"]), np.asarray(c_scan["k_q"])
    )
