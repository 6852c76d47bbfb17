#!/usr/bin/env python
"""End-to-end mini pipeline on a tiny model: the full LLM-QAT lifecycle in
one script, runnable on CPU or a single TPU chip in ~2 minutes.

    1. "teacher": random-init tiny LLaMA saved as an HF checkpoint
    2. data-free synthesis: sample a corpus from the teacher (C11/C12)
    3. KD-QAT: distill the W4A8KV4 student from the teacher (C6/C10)
    4. eval: perplexity + a zero-shot task through the harness
    5. export + serve: true-int8 weights through the continuous-batching
       engine with the paged KV cache

Usage: python examples/tiny_pipeline.py [workdir]
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llm_qat_tpu.cli import train as cli_train
from llm_qat_tpu.data import synthesis as S
from llm_qat_tpu.data.dataset import ByteTokenizer
from llm_qat_tpu.eval import zero_shot as Z
from llm_qat_tpu.inference import engine as E
from llm_qat_tpu.inference import quantized as Q
from llm_qat_tpu.models import convert, llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.utils import args as A


def main(workdir: str = "/tmp/llm_qat_tiny_pipeline"):
    os.makedirs(workdir, exist_ok=True)
    tok = ByteTokenizer()
    cfg = LlamaConfig(
        vocab_size=tok.vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )

    # 1. teacher checkpoint
    teacher_dir = os.path.join(workdir, "teacher")
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    convert.save_hf_checkpoint(params, cfg, teacher_dir)
    print(f"[1/5] teacher checkpoint -> {teacher_dir}")

    # 2. data-free synthesis (2 shards, then merge)
    gen_dir = os.path.join(workdir, "gen_data")
    for shard in range(2):
        S.synthesize_shard(
            params, cfg, shard, gen_dir,
            detokenize=tok.decode,
            n_vocab_per_shard=8, batch_size=8, total_len=48,
            eos_id=None, dtype=jnp.float32,
        )
    corpus = S.merge_shards(gen_dir)
    n_docs = sum(1 for _ in open(corpus))
    print(f"[2/5] synthesized {n_docs} docs -> {corpus}")

    # 3. KD-QAT at W4A8KV4
    out_dir = os.path.join(workdir, "qat")
    result = cli_train.run(
        A.ModelArguments(
            input_model_filename=teacher_dir,
            output_model_filename="tiny-w4a8kv4",
            local_dir=workdir,
            tokenizer="byte",
            w_bits=4, a_bits=8, kv_bits=4,
        ),
        A.DataArguments(
            train_data_local_path=corpus, eval_data_local_path=corpus
        ),
        A.TrainingArguments(
            output_dir=out_dir, model_max_length=32, qat=True, use_kd=True,
            max_steps=10, save_steps=5, learning_rate=1e-3, bf16=False,
            gradient_checkpointing=False, per_device_train_batch_size=2,
            mesh_fsdp=-1,
        ),
        tokenize=tok.encode,
    )
    print(
        f"[3/5] QAT: {result['train_steps']} steps, "
        f"eval ppl {result['perplexity']:.1f} -> {result['model_path']}"
    )

    # 4. zero-shot through the harness (toy task)
    qcfg, qat_params = convert.load_hf_checkpoint(
        result["model_path"], dtype=jnp.float32,
        w_bits=4, a_bits=8, kv_bits=4,
    )
    docs = [
        {"goal": "say hello", "sol1": "hello", "sol2": "xq!z", "label": 0},
        {"goal": "count", "sol1": "one two", "sol2": "zz@@", "label": 0},
    ]
    m = Z.evaluate_task(
        qat_params, qcfg, "piqa", docs, tok.encode, compute_dtype=jnp.float32
    )
    print(f"[4/5] zero-shot piqa (toy): acc={m['acc']:.2f} acc_norm={m['acc_norm']:.2f}")

    # 5. int8 export + continuous-batching serving
    serve_cfg = qcfg.replace(w_bits=8, a_bits=8, kv_bits=8)
    qparams = Q.quantize_params(qat_params, serve_cfg)
    eng = E.InferenceEngine(
        qparams, serve_cfg, max_batch=2, max_len=96, dtype=jnp.float32
    )
    for prompt in ["hello ", "the quick "]:
        eng.submit(tok.encode(prompt), max_new_tokens=12, temperature=0.8)
    done = eng.run()
    for r in done:
        print(f"[5/5] served: {tok.decode(r.output)!r}")
    print("pipeline complete")
    return result


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
