"""QAT training entry point — the reference's ``train.py`` (C10) re-done for
a TPU mesh.

Reference flow (train.py:42-149): init NCCL process group; build quantized
student from an HF checkpoint with bit-widths injected into the config;
attach a frozen fp teacher; tokenize; build block datasets; run KDTrainer;
save (teacher-stripped); evaluate perplexity. Here: `jax.distributed`
multi-host init, one global mesh, Orbax step checkpoints, HF-format final
export of the latent fp weights.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.data import dataset as D
from llm_qat_tpu.models import convert
from llm_qat_tpu.parallel import mesh as pmesh
from llm_qat_tpu.training import trainer as T
from llm_qat_tpu.utils import args as A
from llm_qat_tpu.utils.checkpoint import CheckpointManager
from llm_qat_tpu.utils.logging_utils import MetricsLogger, get_logger
from llm_qat_tpu.utils.profiling import StepTimer


def maybe_init_distributed() -> None:
    """`jax.distributed.initialize()` when launched multi-host (the
    `dist.init_process_group("nccl")` analog, train.py:43). Single-process
    runs skip it."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def run(
    model_args: A.ModelArguments,
    data_args: A.DataArguments,
    training_args: A.TrainingArguments,
    *,
    tokenize=None,
    detokenize=None,
) -> dict:
    log = get_logger()
    log.info("model args %s", model_args)
    if training_args.debug_nans:
        # the sanitizer mode the reference lacks (SURVEY.md §5 "Race
        # detection / sanitizers"): fail fast on any NaN in any jitted value
        jax.config.update("jax_debug_nans", True)

    # --- model (train.py:49-70): bit-widths injected into the config copy ---
    bits = dict(
        w_bits=model_args.w_bits if training_args.qat else 32,
        a_bits=model_args.a_bits if training_args.qat else 32,
        kv_bits=model_args.kv_bits if training_args.qat else 32,
    )
    dtype = jnp.bfloat16 if training_args.bf16 else jnp.float32
    config, params = convert.load_hf_checkpoint(
        model_args.input_model_filename, dtype=dtype, **bits
    )
    config = config.replace(
        max_position_embeddings=max(
            config.max_position_embeddings, training_args.model_max_length
        ),
        # fast paths on by default: Pallas flash attention (fwd + dedicated
        # bwd kernels; backbone falls back automatically when a padding mask
        # is present or the seq length doesn't block) and the int8-MXU fused
        # fake-quant matmul (quant_dense falls back for unsupported bit
        # configs). Together these measured 1.7x on the full KD-QAT step.
        use_flash_attention=not training_args.no_flash_attention,
        fused_qat_matmul=not training_args.no_fused_qat_matmul,
        fused_norm_quant=not training_args.no_fused_norm_quant,
    )

    teacher_params = None
    teacher_cfg = config.replace(w_bits=32, a_bits=32, kv_bits=32)
    if training_args.use_kd:
        # frozen fp teacher from the same checkpoint (train.py:72-86)
        _, teacher_params = convert.load_hf_checkpoint(
            model_args.input_model_filename, dtype=dtype
        )

    # --- tokenizer + data (train.py:90-110) ---
    if tokenize is None:
        _, tokenize = D.load_tokenizer(
            model_args.tokenizer or model_args.input_model_filename
        )
    train_ds, val_ds = D.get_train_val_datasets(
        data_args.train_data_local_path,
        tokenize,
        block_size=training_args.model_max_length,
        eval_path=data_args.eval_data_local_path,
    )
    train_ds = train_ds.shard(jax.process_index(), jax.process_count())
    log.info("train blocks %d, val blocks %d", len(train_ds), len(val_ds))
    if training_args.do_train and len(train_ds) == 0:
        log.warning(
            "0 train blocks: with no --eval_data_local_path the first %d "
            "jsonl lines become validation (reference datautils.py:51-53); "
            "small corpora are swallowed entirely", D.DEFAULT_VAL_LINES,
        )

    # --- mesh + trainer (run_train.sh:42-43 -> mesh axes) ---
    if training_args.mesh_pp > 1 and training_args.mesh_cp > 1:
        raise ValueError("choose one of --mesh_pp / --mesh_cp (not both)")
    mesh = pmesh.make_mesh(
        data=training_args.mesh_data,
        fsdp=training_args.mesh_fsdp,
        tp=training_args.mesh_tp,
        pp=training_args.mesh_pp,
        cp=training_args.mesh_cp,
    )
    parallel = (
        "pp" if training_args.mesh_pp > 1
        else "cp" if training_args.mesh_cp > 1
        else "fsdp"
    )
    n_batch_shards = mesh.shape["data"] * mesh.shape["fsdp"]
    global_batch = training_args.per_device_train_batch_size * n_batch_shards
    steps_per_epoch = max(len(train_ds) // max(global_batch, 1), 1)
    total_steps = (
        training_args.max_steps
        if training_args.max_steps > 0
        else steps_per_epoch * training_args.num_train_epochs
    )

    tcfg = T.TrainConfig(
        learning_rate=training_args.learning_rate,
        total_steps=total_steps,
        warmup_steps=training_args.warmup_steps,
        weight_decay=training_args.weight_decay,
        max_grad_norm=training_args.max_grad_norm,
        lr_schedule=training_args.lr_scheduler_type,
        kd_loss_scale=training_args.kd_loss_scale,
        use_kd=training_args.use_kd and teacher_params is not None,
        grad_accum_steps=training_args.gradient_accumulation_steps,
        remat=training_args.gradient_checkpointing,
        compute_dtype=dtype,
        # chunk the fp32 KL reduction over the sequence so the [b,s,V]
        # logits slabs never fully materialize at 2048x32k (SURVEY §7)
        kl_chunk=256 if training_args.model_max_length >= 1024 else 0,
    )
    tr = T.Trainer(
        config, tcfg, params, teacher_params, teacher_cfg=teacher_cfg,
        mesh=mesh, parallel=parallel,
    )

    ckpt_dir = os.path.join(training_args.output_dir, "checkpoints")
    mngr = CheckpointManager(
        ckpt_dir,
        max_to_keep=training_args.save_total_limit,
        save_interval_steps=training_args.save_steps,
    )
    metrics_log = MetricsLogger(
        training_args.logging_dir or os.path.join(training_args.output_dir, "logs")
    )

    # --- resume (the capability the reference leaves unwired — SURVEY.md §5
    # "Failure detection": HF's resume_from_checkpoint exists upstream but
    # train.py never passes it) ---
    start_step = 0
    if training_args.resume_from_checkpoint:
        latest = mngr.latest_step()
        if latest is not None:
            tr.state = mngr.restore(tr.state)
            start_step = latest
            log.info("resumed from checkpoint step %d", latest)

    # --- train loop (train.py:126; HF Trainer inner loop equivalent) ---
    result = {}
    if training_args.do_train:
        step = start_step
        timer = StepTimer()
        for i, batch in enumerate(
            train_ds.batches(
                global_batch,
                shuffle=True,
                seed=training_args.seed,
                epochs=training_args.num_train_epochs,
            )
        ):
            if i < start_step:  # replay the data order up to the restore point
                continue
            if step >= total_steps:
                break
            m = tr.train_step(batch)
            timer.tick(tokens=batch["input_ids"].size)
            step += 1
            if step % training_args.logging_steps == 0:
                metrics_log.log(step, m)
            if step % 50 == 0 or step == 1:
                log.info("step %d/%d loss %.4f", step, total_steps, float(m["loss"]))
            mngr.maybe_save(step, tr.state)
        mngr.save(step, tr.state)
        mngr.wait()
        result["train_steps"] = step
        result.update(timer.summary())
        log.info("throughput %s", timer.summary())

        # final HF-format latent-fp export, teacher-free by construction
        # (utils/utils.py:39-49)
        if jax.process_index() == 0 and model_args.output_model_filename:
            out = os.path.join(
                model_args.local_dir, "models", model_args.output_model_filename
            )
            host_params = jax.tree.map(np.asarray, tr.state.params)
            convert.save_hf_checkpoint(host_params, config, out)
            result["model_path"] = out

    # --- eval -> perplexity (train.py:131-143) ---
    if training_args.do_eval and len(val_ds):
        eval_batches = list(
            val_ds.batches(
                training_args.per_device_eval_batch_size * n_batch_shards
            )
        )
        m = tr.evaluate(eval_batches)
        log.info("eval %s", m)
        result.update(m)

    metrics_log.close()
    mngr.close()
    return result


def main(argv: Optional[Sequence[str]] = None) -> dict:
    maybe_init_distributed()
    return run(*A.process_args(argv))


if __name__ == "__main__":
    main()
