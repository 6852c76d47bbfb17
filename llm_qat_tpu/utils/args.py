"""Typed dataclass flag parsing (C8).

Reference: utils/process_args.py — `HfArgumentParser` over ModelArguments /
DataArguments / TrainingArguments with the bit-widths on ModelArguments and
the QAT/KD switches on TrainingArguments. Same three-dataclass shape here,
parsed with a small argparse builder instead of the HF dependency, and with
``kv_bits`` a declared field rather than a monkey-patch (train.py:51-54).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Sequence, Tuple, Type


@dataclasses.dataclass
class ModelArguments:
    """process_args.py:16-42 equivalent."""

    input_model_filename: Optional[str] = None   # HF checkpoint dir
    output_model_filename: Optional[str] = None
    local_dir: str = "/tmp/llm_qat_tpu"
    # "" -> tokenizer files from input_model_filename; "byte" -> built-in
    # byte-level tokenizer (smoke runs without SentencePiece files)
    tokenizer: str = ""
    w_bits: int = 32
    a_bits: int = 32
    kv_bits: int = 32


@dataclasses.dataclass
class DataArguments:
    """process_args.py:46-66 equivalent."""

    train_data_local_path: Optional[str] = None
    eval_data_local_path: Optional[str] = None


@dataclasses.dataclass
class TrainingArguments:
    """process_args.py:70-87 + the run_train.sh:8-43 recipe knobs."""

    output_dir: str = "/tmp/output/"
    model_max_length: int = 2048
    qat: bool = False
    use_kd: bool = False
    kd_loss_scale: float = 1.0
    do_train: bool = True
    do_eval: bool = True
    num_train_epochs: int = 1
    per_device_train_batch_size: int = 1
    per_device_eval_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    lr_scheduler_type: str = "cosine"
    warmup_steps: int = 0
    max_grad_norm: float = 1.0
    gradient_checkpointing: bool = True
    save_steps: int = 2000
    save_total_limit: int = 1
    logging_dir: Optional[str] = None
    logging_steps: int = 1
    bf16: bool = True
    seed: int = 0
    max_steps: int = -1                 # -1: derive from epochs x data
    resume_from_checkpoint: bool = False  # restore latest step in output_dir
    debug_nans: bool = False            # jax nan-checking (SURVEY §5 sanitizers)
    # fast paths (on by default; flags to fall back to the plain XLA paths)
    no_flash_attention: bool = False    # Pallas blockwise attention fwd+bwd
    no_fused_qat_matmul: bool = False   # int8-MXU fused fake-quant matmuls
    no_fused_norm_quant: bool = False   # producer-fused norm+quant / flash-
                                        # layout projections (round 5)
    # mesh layout (replaces torchrun/--fsdp flags, run_train.sh:8,42-43)
    mesh_data: int = 1
    mesh_fsdp: int = -1
    mesh_tp: int = 1
    mesh_pp: int = 1                    # GPipe pipeline axis (trainer "pp")
    mesh_cp: int = 1                    # ring-attention context axis ("cp")


def _add_dataclass_args(parser: argparse.ArgumentParser, cls: Type) -> None:
    for f in dataclasses.fields(cls):
        name = "--" + f.name
        default = (
            f.default
            if f.default is not dataclasses.MISSING
            else f.default_factory()  # type: ignore[misc]
        )
        if f.type in (bool, "bool") or isinstance(default, bool):
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
            )
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def process_args(
    argv: Optional[Sequence[str]] = None,
) -> Tuple[ModelArguments, DataArguments, TrainingArguments]:
    """Parse one flat CLI into the three dataclasses (process_args.py:89-103)."""
    parser = argparse.ArgumentParser("llm_qat_tpu")
    for cls in (ModelArguments, DataArguments, TrainingArguments):
        _add_dataclass_args(parser, cls)
    ns = parser.parse_args(argv)

    def build(cls):
        return cls(**{f.name: getattr(ns, f.name) for f in dataclasses.fields(cls)})

    return build(ModelArguments), build(DataArguments), build(TrainingArguments)
