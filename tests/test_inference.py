"""Inference engine tests: true-int serving numerics vs the fake-quant
training model, ragged decode correctness, continuous-batching scheduler
invariance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llm_qat_tpu.inference import engine as E
from llm_qat_tpu.inference import model as M
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import TINY_TEST


CFG = TINY_TEST.replace(w_bits=8, a_bits=8, kv_bits=8)
PARAMS = llama.init_params(CFG, jax.random.PRNGKey(0))
QPARAMS = Q.quantize_params(PARAMS, CFG)


def test_quantize_params_structure():
    qkv = QPARAMS["layers"]["qkv"]
    n_out = (
        PARAMS["layers"]["q"].shape[-1]
        + PARAMS["layers"]["k"].shape[-1]
        + PARAMS["layers"]["v"].shape[-1]
    )
    assert qkv["q"].dtype == jnp.int8
    assert qkv["q"].shape == PARAMS["layers"]["q"].shape[:-1] + (n_out,)
    assert qkv["s"].shape == (CFG.num_hidden_layers, 1, n_out)


def test_w4_packing_structure():
    cfg4 = CFG.replace(w_bits=4)
    qp = Q.quantize_params(PARAMS, cfg4)
    gu = qp["layers"]["gateup"]
    assert gu["q"].dtype == jnp.uint8
    assert gu["q"].shape[1] == PARAMS["layers"]["gate"].shape[1] // 2


def test_serving_logits_match_training_model():
    """True-int serving forward must match the fake-quant training forward
    (same math, integer accumulation) on a fresh prefill."""
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, CFG.vocab_size)
    want = np.asarray(llama.forward(PARAMS, CFG, ids))  # fp32 path

    cache = M.init_serving_cache(CFG, batch=2, max_len=32)
    logits, cache = M.serving_forward(
        QPARAMS, CFG, ids,
        jnp.zeros((2,), jnp.int32), jnp.ones((2,), bool), cache,
        dtype=jnp.float32,
    )
    got = np.asarray(logits)
    # int8 path vs fp fake-quant: tiny associativity differences only
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(cache["lengths"]), [16, 16])


def test_serving_ragged_decode():
    """Slots at different lengths must decode like isolated sequences."""
    ids_a = jax.random.randint(jax.random.PRNGKey(2), (1, 12), 0, CFG.vocab_size)
    ids_b = jax.random.randint(jax.random.PRNGKey(3), (1, 7), 0, CFG.vocab_size)

    def isolated(ids):
        cache = M.init_serving_cache(CFG, 1, 32)
        lg, cache = M.serving_forward(
            QPARAMS, CFG, ids, jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), bool), cache, dtype=jnp.float32,
        )
        return np.asarray(lg[0, ids.shape[1] - 1])

    want_a, want_b = isolated(ids_a), isolated(ids_b)

    # joint cache: prefill a then b (ragged), compare last-token logits
    cache = M.init_serving_cache(CFG, 2, 32)
    ids = np.zeros((2, 12), np.int32)
    ids[0] = np.asarray(ids_a[0])
    lg, cache = M.serving_forward(
        QPARAMS, CFG, jnp.asarray(ids), jnp.zeros((2,), jnp.int32),
        jnp.asarray([True, False]), cache, dtype=jnp.float32,
    )
    got_a = np.asarray(lg[0, 11])
    ids2 = np.zeros((2, 7), np.int32)
    ids2[1] = np.asarray(ids_b[0])
    lg2, cache = M.serving_forward(
        QPARAMS, CFG, jnp.asarray(ids2), cache["lengths"],
        jnp.asarray([False, True]), cache, dtype=jnp.float32,
    )
    got_b = np.asarray(lg2[1, 6])
    np.testing.assert_allclose(got_a, want_a, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got_b, want_b, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(cache["lengths"]), [12, 7])


def _greedy_reference(prompt, n):
    """Greedy rollout on the fake-quant training model."""
    cache = llama.init_cache(CFG, 1, 64, dtype=jnp.float32)
    ids = jnp.asarray([prompt], jnp.int32)
    lg, cache = llama.forward_with_cache(PARAMS, CFG, ids, cache, dtype=jnp.float32)
    out = []
    tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    for _ in range(n):
        out.append(int(tok[0, 0]))
        lg, cache = llama.forward_with_cache(PARAMS, CFG, tok, cache, dtype=jnp.float32)
        tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
    return out


@pytest.mark.slow
def test_engine_greedy_matches_training_model():
    eng = E.InferenceEngine(
        QPARAMS, CFG, max_batch=2, max_len=64, dtype=jnp.float32
    )
    prompt = [5, 9, 3]
    eng.submit(prompt, max_new_tokens=6)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 6
    want = _greedy_reference(prompt, 6)
    # integer vs fp paths can flip ties on a random tiny model; require the
    # prefix to agree
    assert done[0].output[:3] == want[:3], (done[0].output, want)


@pytest.mark.slow
def test_engine_continuous_batching_invariance():
    """Outputs must not depend on co-scheduling: 3 requests through a
    2-slot engine (forcing queueing + mixed-length decode) == each run
    alone."""
    prompts = [[5, 9, 3], [7, 7], [1, 2, 3, 4]]

    def run_alone(p):
        eng = E.InferenceEngine(QPARAMS, CFG, max_batch=2, max_len=64, dtype=jnp.float32)
        eng.submit(p, max_new_tokens=5)
        return eng.run()[0].output

    want = [run_alone(p) for p in prompts]

    eng = E.InferenceEngine(QPARAMS, CFG, max_batch=2, max_len=64, dtype=jnp.float32)
    uids = [eng.submit(p, max_new_tokens=5) for p in prompts]
    done = {r.uid: r.output for r in eng.run()}
    got = [done[u] for u in uids]
    assert got == want


@pytest.mark.slow
def test_engine_eos_stops():
    eng = E.InferenceEngine(QPARAMS, CFG, max_batch=1, max_len=64, dtype=jnp.float32)
    # discover the first greedy token, then use it as "eos"
    first = _greedy_reference([5, 9, 3], 1)[0]
    eng.submit([5, 9, 3], max_new_tokens=10, eos_id=first)
    done = eng.run()
    assert done[0].output == [first]


def test_quantize_params_host_matches_device():
    """Host-side numpy quantization == on-device quantize_params."""
    import numpy as np

    host = jax.tree.map(lambda x: np.asarray(x), PARAMS)
    a = Q.quantize_params_host(host, CFG)
    b = QPARAMS
    np.testing.assert_array_equal(
        np.asarray(a["layers"]["qkv"]["q"]), np.asarray(b["layers"]["qkv"]["q"])
    )
    np.testing.assert_allclose(
        np.asarray(a["layers"]["qkv"]["s"]), np.asarray(b["layers"]["qkv"]["s"]),
        rtol=1e-6,
    )
    cfg4 = CFG.replace(w_bits=4)
    a4 = Q.quantize_params_host(host, cfg4)
    b4 = Q.quantize_params(PARAMS, cfg4)
    np.testing.assert_array_equal(
        np.asarray(a4["layers"]["down"]["q"]), np.asarray(b4["layers"]["down"]["q"])
    )


@pytest.mark.slow
def test_engine_long_prompt_bucket_fits_cache():
    """A prompt whose pow2 bucket exceeds max_len must not crash prefill."""
    eng = E.InferenceEngine(QPARAMS, CFG, max_batch=1, max_len=48, dtype=jnp.float32)
    prompt = list(np.random.default_rng(0).integers(1, CFG.vocab_size, 40))
    eng.submit(prompt, max_new_tokens=4)
    done = eng.run()
    assert len(done) == 1 and len(done[0].output) == 4


@pytest.mark.parametrize("rope_mode", ["pre", "post"])
def test_flash_prefill_matches_xla_prefill(rope_mode):
    """from_empty flash prefill (fresh fake-quant KV, causal flash kernel)
    must match the XLA whole-cache prefill path: logits and the cache ints
    it writes."""
    cfg = CFG.replace(kv_cache_rope=rope_mode)
    qp = Q.quantize_params(PARAMS, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 16), 0, cfg.vocab_size)
    lens = jnp.zeros((2,), jnp.int32)
    act = jnp.ones((2,), bool)

    cache_a = M.init_serving_cache(cfg, batch=2, max_len=64)
    la, ca = M.serving_forward(
        qp, cfg.replace(use_prefill_flash=False), ids, lens, act, cache_a,
        dtype=jnp.float32,
    )
    cache_b = M.init_serving_cache(cfg, batch=2, max_len=64)
    lb, cb = M.serving_forward(
        qp, cfg, ids, lens, act, cache_b, dtype=jnp.float32, from_empty=True,
    )
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(
        np.asarray(ca["lengths"]), np.asarray(cb["lengths"])
    )
    # scales can differ in the last ulp (different fusion order changes
    # f32 rounding), which can flip a borderline int by 1
    for k in ("k_s", "v_s"):
        np.testing.assert_allclose(np.asarray(ca[k]), np.asarray(cb[k]),
                                   rtol=1e-6)
    for k in ("k_q", "v_q"):
        diff = np.abs(
            np.asarray(ca[k], np.int32) - np.asarray(cb[k], np.int32)
        )
        assert diff.max() <= 1


@pytest.mark.slow
def test_engine_flash_prefill_token_parity():
    """Engine output must be identical with the flash prefill on vs off
    (greedy decoding; both prefill paths quantize the same ints)."""
    prompts = [[3, 5, 7, 11, 13, 17, 19, 23], [2, 4, 6]]
    outs = []
    for flag in (True, False):
        eng = E.InferenceEngine(
            Q.quantize_params(PARAMS, CFG.replace(use_prefill_flash=flag)),
            CFG.replace(use_prefill_flash=flag),
            max_batch=2, max_len=64, dtype=jnp.float32,
        )
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        done = sorted(eng.run(), key=lambda r: r.uid)
        outs.append([r.output for r in done])
    assert outs[0] == outs[1]


@pytest.mark.parametrize("a_bits", [6, 16])
def test_serving_honors_a_bits(a_bits):
    """A6/A16-trained configs must serve with the numerics they trained
    with (VERDICT round-2 missing #2): serving forward vs the fake-quant
    training oracle at the same a_bits."""
    cfg = TINY_TEST.replace(w_bits=4, a_bits=a_bits, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    want = np.asarray(llama.forward(params, cfg, ids))

    cache = M.init_serving_cache(cfg, batch=2, max_len=32)
    logits, _ = M.serving_forward(
        qparams, cfg, ids,
        jnp.zeros((2,), jnp.int32), jnp.ones((2,), bool), cache,
        dtype=jnp.float32,
    )
    # A16: serving runs fp acts where training fake-quants at 16 bits/token
    # (~2^-15 relative) — the tolerance absorbs it
    np.testing.assert_allclose(np.asarray(logits), want, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_serving_a6_decode_kernel_scan_agree():
    """The fused decode kernel and the plain-XLA decode path must agree at
    a_bits=6 — the kernel previously hardcoded A8. (Formerly checked via
    the unrolled study variant, deleted in round 5.)"""
    from tests.serving_helpers import _prefilled

    cfg = TINY_TEST.replace(w_bits=8, a_bits=6, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    b, max_len = 2, 32
    cache = _prefilled(cfg, qparams, b, max_len, [5, 9])
    tok = jax.random.randint(jax.random.PRNGKey(7), (b, 1), 0, cfg.vocab_size)
    active = jnp.ones((b,), bool)
    lg_scan, _ = M.serving_forward(
        qparams, cfg, tok, cache["lengths"], active, cache, dtype=jnp.float32
    )
    lg_xla, _ = M.serving_forward(
        qparams, cfg.replace(use_decode_kernel=False, use_megakernel=False),
        tok, cache["lengths"], active, cache, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(lg_xla), np.asarray(lg_scan), rtol=2e-4, atol=2e-4
    )


def test_serving_a12_raises():
    """9..15-bit activations don't fit the int8 serving container — must
    error loudly, not silently serve A8."""
    cfg = TINY_TEST.replace(w_bits=8, a_bits=12, kv_bits=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    qparams = Q.quantize_params(params, cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    cache = M.init_serving_cache(cfg, 1, 16)
    with pytest.raises(NotImplementedError, match="int8"):
        M.serving_forward(
            qparams, cfg, ids, jnp.zeros((1,), jnp.int32),
            jnp.ones((1,), bool), cache,
        )


def test_engine_rejects_overlong_request():
    """Over-capacity submissions error loudly instead of silently decoding
    from a truncated prefix (VERDICT round-2 item 8)."""
    eng = E.InferenceEngine(QPARAMS, CFG, max_batch=1, max_len=32)
    with pytest.raises(ValueError, match="does not fit"):
        eng.submit(list(range(1, 30)), max_new_tokens=8)
    # paged engine: same contract
    from llm_qat_tpu.inference import paged_engine as PE
    from llm_qat_tpu.inference.paged import PagedConfig
    peng = PE.PagedInferenceEngine(
        QPARAMS, CFG, max_batch=1,
        pcfg=PagedConfig(page_size=8, n_pages=8, max_pages_per_seq=4),
    )
    with pytest.raises(ValueError, match="does not fit"):
        peng.submit(list(range(1, 30)), max_new_tokens=8)


@pytest.mark.slow
def test_engine_batched_same_bucket_admission(monkeypatch):
    """4 same-bucket prompts must admit via ONE prefill call, and token
    outputs must match the serial-admission baseline."""
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(1, CFG.vocab_size, n)) for n in (9, 12, 11, 10)]

    def outputs(eng):
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        return {r.uid: r.output for r in eng.run()}

    eng = E.InferenceEngine(QPARAMS, CFG, max_batch=4, max_len=64,
                            dtype=jnp.float32)
    calls = []
    real = eng._prefill
    eng._prefill = lambda qp, ids: (calls.append(ids.shape), real(qp, ids))[1]
    got = outputs(eng)
    assert calls == [(4, 16)], calls  # one batched prefill, pow2 bucket

    # serial baseline: admit one at a time (batch-1 groups)
    eng1 = E.InferenceEngine(QPARAMS, CFG, max_batch=1, max_len=64,
                             dtype=jnp.float32)
    want = outputs(eng1)
    assert got == want


@pytest.mark.parametrize("rope_mode", ["pre", "post"])
def test_kv4_packed_cache_matches_int8_container(rope_mode):
    """KV4 nibble-packed cache (kv_cache_pack) must produce IDENTICAL
    logits to the int8-container path — the ints are the same, only the
    storage differs (VERDICT round-2 weak #4)."""
    cfg_p = TINY_TEST.replace(
        w_bits=8, a_bits=8, kv_bits=4, kv_cache_rope=rope_mode,
        kv_cache_pack=True,
    )
    cfg_u = cfg_p.replace(kv_cache_pack=False)
    params = llama.init_params(cfg_p, jax.random.PRNGKey(0))
    qp = Q.quantize_params(params, cfg_p)
    b, max_len = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (b, 16), 0, cfg_p.vocab_size)

    def run(cfg):
        cache = M.init_serving_cache(cfg, b, max_len)
        lg, cache = M.serving_forward(
            qp, cfg, ids, jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool), cache, dtype=jnp.float32,
        )
        # one decode step on top (exercises the packed decode kernel)
        tok = jnp.argmax(lg[:, -1:], -1).astype(jnp.int32)
        lg2, cache = M.serving_forward(
            qp, cfg, tok, cache["lengths"], jnp.ones((b,), bool), cache,
            dtype=jnp.float32,
        )
        return np.asarray(lg2), cache

    lg_p, cache_p = run(cfg_p)
    lg_u, cache_u = run(cfg_u)
    assert cache_p["k_q"].dtype == jnp.uint8
    assert cache_p["k_q"].shape[3] == cfg_p.head_dim // 2  # half the bytes
    np.testing.assert_allclose(lg_p, lg_u, rtol=2e-5, atol=2e-5)
    # the packed ints ARE the container ints, nibble-packed
    ku = np.asarray(cache_u["k_q"])  # [L, b, kvh, hd, S]
    kp = np.asarray(cache_p["k_q"])  # [L, b, kvh, hd/2, S]
    h2 = cfg_p.head_dim // 2
    lo = (ku[:, :, :, :h2].astype(np.uint8)) & 0xF
    hi = (ku[:, :, :, h2:].astype(np.uint8)) & 0xF
    np.testing.assert_array_equal(kp, (hi << 4 | lo).astype(np.uint8))
