"""Logging / metrics (SURVEY.md §5 "Metrics / logging / observability").

Reference: stdlib console logger (utils/utils.py:17-36) + HF Trainer
tensorboard scalars every step (run_train.sh:28,34). Here: the same console
format, host-0 gating for multi-process runs, and a JSONL metrics sink with
optional TensorBoard mirroring when `tensorboardX` is importable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

import jax

_FMT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(name: str = "llm_qat_tpu", rank0_only: bool = True) -> logging.Logger:
    """Timestamped console logger (utils/utils.py:17-36); silenced on
    non-zero hosts when rank0_only."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    if rank0_only and jax.process_index() != 0:
        logger.setLevel(logging.ERROR)
    return logger


class MetricsLogger:
    """Per-step scalar metrics: JSONL file + TensorBoard (default on).

    TensorBoard parity with the reference recipe (``--report_to
    tensorboard`` by default, run_train.sh:34) via the in-repo synchronous
    event writer (utils/tb_writer.py) — no tensorboardX dependency and no
    forked writer process (the round-1 abort hazard). Disable with
    ``LLM_QAT_TENSORBOARD=0``."""

    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: Optional[bool] = None):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if use_tensorboard is None:
            use_tensorboard = os.environ.get("LLM_QAT_TENSORBOARD", "1") != "0"
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                from llm_qat_tpu.utils.tb_writer import ScalarEventWriter

                self._tb = ScalarEventWriter(log_dir)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._jsonl is not None:
            rec = {"step": step, "time": time.time()}
            rec.update({k: float(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalars(step, {k: float(v) for k, v in metrics.items()})

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
