"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

The reference has only HF-Trainer tensorboard scalars; here:
  * `trace(log_dir)` — context manager around `jax.profiler` capturing a
    device trace viewable in TensorBoard/Perfetto/XProf;
  * `StepTimer` — wall-clock per-step stats with tokens/s, the metric the
    north star reports (tokens/s/chip at 1 chip / 1 host / N hosts);
  * `annotate(name)` — TraceAnnotation wrapper for labeling step phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

# Per-chip peak dense-matmul throughput (FLOP/s) for MFU accounting. Keyed by
# substrings of jax.devices()[0].device_kind. Public numbers: v5e (a.k.a.
# "v5 lite") 197 TF/s bf16 / 394 TOP/s int8; v5p 459/918; v4 275 bf16 (no
# int8 doubling); v6e (Trillium) 918/1836.
_PEAK_FLOPS = {
    "v5 lite": (197e12, 394e12),
    "v5e": (197e12, 394e12),
    "v5p": (459e12, 918e12),
    "v4": (275e12, 275e12),
    "v6": (918e12, 1836e12),
}


def chip_peak_flops(int8: bool = False) -> Optional[float]:
    """Peak FLOP/s of one attached chip (bf16, or int8 when the MXU carries
    the matmuls as int8), or None when the chip kind is unknown (CPU)."""
    kind = jax.devices()[0].device_kind.lower()
    for key, (bf16, i8) in _PEAK_FLOPS.items():
        if key in kind:
            return i8 if int8 else bf16
    return None


def model_flops_per_token(cfg, seq_len: int, training: bool = False) -> float:
    """Model FLOPs per processed token for one forward pass (×3 when
    ``training`` for fwd+bwd), standard 2·N-params matmul accounting plus the
    2·2·s·H attention-score term. ``cfg`` is an `LlamaConfig`."""
    h, layers = cfg.hidden_size, cfg.num_hidden_layers
    kv_dim = cfg.kv_heads * cfg.head_dim
    per_layer_params = (
        h * h + 2 * h * kv_dim + h * h          # q, k, v, o projections
        + 3 * h * cfg.intermediate_size         # gate, up, down
    )
    matmul = 2 * (layers * per_layer_params + h * cfg.vocab_size)
    # QK^T + PV: 2 matmuls of [s, d] @ [d, s] per head => 4*s*h per token
    # (causal masking halves the useful half but the FLOPs are still issued)
    attn = layers * 4 * seq_len * h
    fwd = matmul + attn
    return fwd * (3 if training else 1)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing: call ``tick(tokens)`` once per step."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self.reset()

    def reset(self):
        self._count = 0
        self._tokens = 0
        self._elapsed = 0.0
        self._last: Optional[float] = None

    def tick(self, tokens: int = 0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._elapsed += now - self._last
                self._tokens += tokens
        self._last = now

    @property
    def steps_timed(self) -> int:
        return max(self._count - self.warmup, 0)

    def summary(self) -> Dict[str, float]:
        n = self.steps_timed
        if n == 0 or self._elapsed == 0:
            return {"step_time_s": float("nan"), "tokens_per_s": 0.0}
        per_chip = max(len(jax.devices()), 1)
        return {
            "step_time_s": self._elapsed / n,
            "tokens_per_s": self._tokens / self._elapsed,
            "tokens_per_s_per_chip": self._tokens / self._elapsed / per_chip,
        }
