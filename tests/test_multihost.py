"""Multi-host (multi-process) training test: two jax.distributed processes
on one machine form a single spanning mesh and run the FSDP KD train step
(SURVEY.md §4 "Multi-host logic tested with jax.distributed loopback")."""

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
