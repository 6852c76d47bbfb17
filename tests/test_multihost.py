"""Multi-host (multi-process) dress rehearsal: two jax.distributed
processes on one machine form a single spanning mesh and run (a) the FSDP
KD train step and (b) the tensor-parallel serving decode loop
(SURVEY.md §4 "Multi-host logic tested with jax.distributed loopback";
VERDICT round-1 item 10)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest


WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    import jax.numpy as jnp
    sys.path.insert(0, os.getcwd())  # launched with cwd = repo root
    from llm_qat_tpu.models import llama
    from llm_qat_tpu.models.config import TINY_TEST
    from llm_qat_tpu.training import trainer as T
    from llm_qat_tpu.parallel import mesh as pmesh

    cfg = TINY_TEST.replace(w_bits=4, a_bits=8, kv_bits=4)
    mesh = pmesh.make_mesh(data=1, fsdp=len(jax.devices()), tp=1)
    tc = T.TrainConfig(learning_rate=1e-3, remat=False, compute_dtype=jnp.float32)
    teacher = llama.init_params(
        cfg.replace(w_bits=32, a_bits=32, kv_bits=32), jax.random.PRNGKey(0)
    )
    student = llama.init_params(cfg, jax.random.PRNGKey(1))
    tr = T.Trainer(cfg, tc, student, teacher, mesh=mesh)
    ids = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, cfg.vocab_size)
    m = tr.train_step({"input_ids": ids, "labels": ids})
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())
    print(f"MHLOSS {float(m['loss']):.8f}", flush=True)
    """
)


SERVE_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    sys.path.insert(0, os.getcwd())
    from llm_qat_tpu.models import llama
    from llm_qat_tpu.models.config import TINY_TEST
    from llm_qat_tpu.inference import model as M, quantized as Q, sharded as S

    # kv heads must divide the spanning tp axis (4 devices/proc x nprocs)
    tp = 4 * nprocs
    cfg = TINY_TEST.replace(
        w_bits=8, a_bits=8, kv_bits=8,
        num_attention_heads=8, num_key_value_heads=8,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    B, CAP, STEPS = 2, 32, 6
    prompt = jax.random.randint(jax.random.PRNGKey(1), (B, 4), 0, cfg.vocab_size)

    # single-device reference, computed locally in every process
    qp1 = Q.quantize_params(params, cfg)
    c1 = M.init_serving_cache(cfg, B, CAP)
    lens = jnp.zeros((B,), jnp.int32); act = jnp.ones((B,), bool)
    lg, c1 = M.serving_forward(qp1, cfg, prompt, lens, act, c1, dtype=jnp.float32)
    ref_toks = []
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
    for _ in range(STEPS):
        ref_toks.append(np.asarray(tok)[:, 0])
        lg, c1 = M.serving_forward(
            qp1, cfg, tok, c1["lengths"], act, c1, dtype=jnp.float32
        )
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]

    # tensor-parallel serving over the spanning mesh (both processes)
    mesh = Mesh(np.array(jax.devices()).reshape(tp), ("tp",))
    qp2 = S.quantize_params_tp(params, cfg, tp)
    qp2 = S.place(qp2, mesh, S.qparam_specs(qp2))
    c2 = S.init_serving_cache_tp(cfg, B, CAP, mesh)
    fwd = S.make_tp_forward(cfg, mesh, qp2, dtype=jnp.float32)
    lg, c2 = fwd(qp2, prompt, lens, act, c2)
    tp_toks = []
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
    for _ in range(STEPS):
        tp_toks.append(np.asarray(jax.device_get(tok))[:, 0])
        lg, c2 = fwd(qp2, tok, c2["lengths"], act, c2)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]

    ref = np.stack(ref_toks); got = np.stack(tp_toks)
    assert (ref == got).all(), (ref, got)
    print("MHTOKENS " + ",".join(map(str, got.ravel().tolist())), flush=True)
    """
)


ENGINE_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nprocs = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, os.getcwd())
    from llm_qat_tpu.models import llama
    from llm_qat_tpu.models.config import TINY_TEST
    from llm_qat_tpu.inference import quantized as Q
    from llm_qat_tpu.inference.engine import InferenceEngine
    from llm_qat_tpu.inference.multihost import MultiHostServingDriver

    cfg = TINY_TEST.replace(
        w_bits=8, a_bits=8, kv_bits=8, num_key_value_heads=4,
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(11)
    prompts = [list(map(int, rng.integers(1, cfg.vocab_size, n)))
               for n in (5, 9, 7, 12)]

    # single-device (no-mesh) engine reference, computed in every process
    ref_eng = InferenceEngine(
        Q.quantize_params(params, cfg), cfg, max_batch=2, max_len=64,
        steps_per_sync=4, dtype=jnp.float32,
    )
    uid_to_i = {ref_eng.submit(p, max_new_tokens=6): i
                for i, p in enumerate(prompts)}
    ref = {uid_to_i[r.uid]: r.output for r in ref_eng.run()}

    # data-over-hosts x tp-within-host: each process serves its partition
    # over a LOCAL 4-device tp mesh (no cross-host collective exists)
    drv = MultiHostServingDriver(
        params, cfg, tp=4, max_batch=2, max_len=64, steps_per_sync=4,
        dtype=jnp.float32,
    )
    guid_to_i = {drv.submit(p, max_new_tokens=6): i
                 for i, p in enumerate(prompts)}
    mine = drv.run()
    # this host must have served exactly its owned partition ...
    owned = sorted(i for g, i in guid_to_i.items()
                   if drv.owner(g) == pid)
    served = sorted(guid_to_i[r.uid] for r in mine)
    assert served == owned, (served, owned)
    # ... with single-device-identical greedy tokens
    for r in mine:
        i = guid_to_i[r.uid]
        assert r.output == ref[i], (i, r.output, ref[i])
    print("MHSERVE " + ",".join(
        f"{guid_to_i[r.uid]}:" + "/".join(map(str, r.output))
        for r in sorted(mine, key=lambda r: r.uid)
    ), flush=True)
    """
)


def _run_workers(tmp_path, script, n=2, timeout=420):
    worker = tmp_path / "worker.py"
    worker.write_text(script)
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, text=True,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    return outs


@pytest.mark.slow
def test_two_process_tp_serving_token_parity(tmp_path):
    """Two-process TP serving must emit exactly the single-device tokens,
    identically on every host (the serve half of the multi-host dress
    rehearsal)."""
    outs = _run_workers(tmp_path, SERVE_WORKER)
    lines = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHTOKENS")]
        assert line, out[-2000:]
        lines.append(line[0])
    assert lines[0] == lines[1]


@pytest.mark.slow
def test_two_process_data_x_tp_serving(tmp_path):
    """The multi-host serving composition DESIGN.md describes — requests
    partitioned across hosts, each host a tp engine over its local
    devices — serves every request with single-device-identical tokens
    and a disjoint, exhaustive partition (VERDICT r3 item 9)."""
    outs = _run_workers(tmp_path, ENGINE_WORKER)
    served = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHSERVE")]
        assert line, out[-2000:]
        for part in line[0][len("MHSERVE "):].split(","):
            served.append(int(part.split(":")[0]))
    # the two hosts together served all 4 prompts exactly once
    assert sorted(served) == [0, 1, 2, 3], served


@pytest.mark.slow
def test_two_process_fsdp_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHLOSS")]
        assert line, out[-2000:]
        losses.append(float(line[0].split()[1]))
    assert losses[0] == losses[1]
