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
    """Per-step scalar metrics: JSONL file + optional TensorBoard.

    TensorBoard mirroring is opt-in via ``LLM_QAT_TENSORBOARD=1``:
    tensorboardX's event writer forks a subprocess, which can abort a
    process with live XLA threads (observed as nondeterministic
    "Fatal Python error: Aborted" during later jax dispatches)."""

    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: Optional[bool] = None):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if use_tensorboard is None:
            use_tensorboard = os.environ.get("LLM_QAT_TENSORBOARD") == "1"
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self._tb = SummaryWriter(log_dir)
                except ImportError:
                    pass

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._jsonl is not None:
            rec = {"step": step, "time": time.time()}
            rec.update({k: float(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
