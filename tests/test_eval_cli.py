"""Eval CLI end-to-end + training resume."""

import json
import os

import numpy as np
import jax

from llm_qat_tpu.cli import eval as cli_eval
from llm_qat_tpu.cli import train as cli_train
from llm_qat_tpu.models import convert, llama
from llm_qat_tpu.models.config import TINY_TEST
from llm_qat_tpu.utils import args as A
import pytest


def _ckpt(tmp_path):
    ckpt = str(tmp_path / "m")
    params = llama.init_params(TINY_TEST, jax.random.PRNGKey(0))
    convert.save_hf_checkpoint(params, TINY_TEST, ckpt)
    return ckpt


def test_eval_cli_zero_shot_and_ppl(tmp_path):
    ckpt = _ckpt(tmp_path)
    tasks = str(tmp_path / "tasks")
    os.makedirs(tasks)
    with open(os.path.join(tasks, "piqa.jsonl"), "w") as f:
        for i in range(4):
            f.write(json.dumps(
                {"goal": f"goal {i}", "sol1": "aa", "sol2": "bb", "label": i % 2}
            ) + "\n")
    ppl_data = str(tmp_path / "ppl.jsonl")
    with open(ppl_data, "w") as f:
        for i in range(5):
            f.write(json.dumps({"text": "hello world " * 30}) + "\n")

    res = cli_eval.main([
        "--model", ckpt, "--tokenizer", "byte",
        "--w_bits", "8", "--a_bits", "8", "--kv_bits", "8",
        "--tasks", "piqa", "--task_dir", tasks,
        "--perplexity_data", ppl_data, "--block_size", "32",
        "--bf16", "false",
        "--output_json", str(tmp_path / "out.json"),
    ])
    assert 0.0 <= res["piqa"]["acc"] <= 1.0
    assert res["piqa"]["n"] == 4
    assert np.isfinite(res["perplexity"]["perplexity"])
    saved = json.load(open(tmp_path / "out.json"))
    assert saved["average_acc_norm"] == res["average_acc_norm"]


@pytest.mark.slow
def test_train_resume(tmp_path):
    """Interrupted run + --resume_from_checkpoint continues from the saved
    step and finishes the remaining steps."""
    ckpt = _ckpt(tmp_path)
    data = str(tmp_path / "d.jsonl")
    rng = np.random.default_rng(0)
    with open(data, "w") as f:
        for _ in range(40):
            f.write(json.dumps(
                {"text": "".join(chr(97 + c) for c in rng.integers(0, 26, 120))}
            ) + "\n")

    def make_args(max_steps):
        m = A.ModelArguments(
            input_model_filename=ckpt, tokenizer="byte",
            local_dir=str(tmp_path / "local"), w_bits=8, a_bits=8, kv_bits=8,
        )
        d = A.DataArguments(train_data_local_path=data, eval_data_local_path=data)
        t = A.TrainingArguments(
            output_dir=str(tmp_path / "out"), model_max_length=32,
            qat=True, use_kd=True, do_eval=False, bf16=False,
            gradient_checkpointing=False, learning_rate=1e-3,
            max_steps=max_steps, save_steps=2,
            mesh_data=1, mesh_fsdp=-1, mesh_tp=1,
            resume_from_checkpoint=True,
        )
        return m, d, t

    def tok(s):
        return [ord(c) % 251 for c in s]

    r1 = cli_train.run(*make_args(2), tokenize=tok)
    assert r1["train_steps"] == 2
    r2 = cli_train.run(*make_args(5), tokenize=tok)
    assert r2["train_steps"] == 5
