#!/usr/bin/env bash
# Canonical QAT recipe — the reference's run_train.sh re-targeted to a TPU
# mesh. Usage: bash run_train.sh <w_bits> <a_bits> <kv_bits>
# The torchrun 8-process launch becomes a single JAX process driving all
# local chips (multi-host: launch once per host with JAX_COORDINATOR_ADDRESS
# set; jax.distributed.initialize picks it up).
set -euo pipefail

W_BITS=${1:-8}
A_BITS=${2:-8}
KV_BITS=${3:-8}

python train.py \
    --input_model_filename "${TEACHER_CKPT:-/path/to/llama-7b}" \
    --output_model_filename "llama-7b-w${W_BITS}a${A_BITS}kv${KV_BITS}" \
    --train_data_local_path "${TRAIN_DATA:-gen_data/all_gen.jsonl}" \
    --eval_data_local_path "${EVAL_DATA:-}" \
    --do_train true \
    --do_eval true \
    --model_max_length 2048 \
    --num_train_epochs 1 \
    --per_device_train_batch_size 1 \
    --per_device_eval_batch_size 1 \
    --gradient_accumulation_steps 1 \
    --save_steps 2000 \
    --save_total_limit 1 \
    --learning_rate 2e-5 \
    --weight_decay 0.0 \
    --warmup_steps 0 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --gradient_checkpointing true \
    --bf16 true \
    --qat true \
    --use_kd true \
    --kd_loss_scale 1.0 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_tp 1 \
    --w_bits "$W_BITS" --a_bits "$A_BITS" --kv_bits "$KV_BITS"
