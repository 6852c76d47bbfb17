"""End-to-end CLI test: HF checkpoint on disk -> QAT KD training over the
8-device mesh -> checkpoints, HF export, eval perplexity (the train.py
flow, C10/C13)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import convert, llama
from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.utils import args as A
from llm_qat_tpu.cli import train as cli_train
import pytest


def fake_tokenize(text):
    return [ord(c) % 251 for c in text]


def test_process_args_defaults_and_overrides():
    m, d, t = A.process_args([])
    assert m.w_bits == 32 and t.learning_rate == 2e-5 and t.save_steps == 2000
    m, d, t = A.process_args(
        ["--w_bits", "4", "--a_bits", "8", "--kv_bits", "4",
         "--qat", "true", "--use_kd", "true", "--mesh_tp", "2",
         "--learning_rate", "1e-4"]
    )
    assert (m.w_bits, m.a_bits, m.kv_bits) == (4, 8, 4)
    assert t.qat and t.use_kd and t.mesh_tp == 2
    assert t.learning_rate == 1e-4


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    # 1. a tiny fp "teacher" checkpoint in HF format on disk
    ckpt = str(tmp_path / "teacher")
    params = llama.init_params(TINY_TEST, jax.random.PRNGKey(0))
    convert.save_hf_checkpoint(params, TINY_TEST, ckpt)

    # 2. training jsonl
    data_path = str(tmp_path / "train.jsonl")
    rng = np.random.default_rng(0)
    with open(data_path, "w") as f:
        for _ in range(40):
            text = "".join(chr(97 + c) for c in rng.integers(0, 26, 200))
            f.write(json.dumps({"text": text}) + "\n")

    out_dir = str(tmp_path / "out")
    margs = A.ModelArguments(
        input_model_filename=ckpt,
        output_model_filename="tiny-w4a8kv4",
        local_dir=str(tmp_path / "local"),
        w_bits=4, a_bits=8, kv_bits=4,
    )
    dargs = A.DataArguments(
        train_data_local_path=data_path, eval_data_local_path=data_path
    )
    targs = A.TrainingArguments(
        output_dir=out_dir,
        model_max_length=32,
        qat=True,
        use_kd=True,
        do_train=True,
        do_eval=True,
        per_device_train_batch_size=1,
        per_device_eval_batch_size=1,
        learning_rate=1e-3,
        max_steps=4,
        save_steps=2,
        bf16=False,
        gradient_checkpointing=False,
        mesh_data=1, mesh_fsdp=4, mesh_tp=2,
    )
    result = cli_train.run(margs, dargs, targs, tokenize=fake_tokenize)

    assert result["train_steps"] == 4
    assert "perplexity" in result and np.isfinite(result["perplexity"])
    # orbax checkpoints written
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))
    # final HF export loads back with the bit-widths
    cfg2, params2 = convert.load_hf_checkpoint(result["model_path"])
    assert cfg2.hidden_size == TINY_TEST.hidden_size
    # metrics jsonl written
    logs = open(os.path.join(out_dir, "logs", "metrics.jsonl")).read().splitlines()
    assert len(logs) == 4 and "loss" in json.loads(logs[0])
