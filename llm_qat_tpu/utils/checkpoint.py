"""Checkpoint / resume via Orbax.

Reference behavior being replaced (SURVEY.md §5 "Checkpoint / resume"):
HF Trainer step checkpoints (`save_steps 2000`, `save_total_limit 1`,
run_train.sh:26-29) plus a final `safe_save_model_for_hf_trainer` that strips
`teacher.*` keys and saves latent fp weights (utils/utils.py:39-49).

Here: Orbax checkpointing of the sharded TrainState (params + Adam state +
step) with retention, and an HF-format exporter for the final latent-fp
artifact (`models.convert.save_hf_checkpoint`). The teacher never enters the
TrainState, so teacher-stripping is structural rather than key filtering.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 1, save_interval_steps: int = 2000):
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True,
            ),
        )

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save if the step hits the interval (save_steps semantics)."""
        return self._mngr.save(step, args=ocp.args.StandardSave(state))

    def save(self, step: int, state: Any) -> bool:
        if step in self._mngr.all_steps():
            return False  # interval save already wrote this step
        return self._mngr.save(
            step, args=ocp.args.StandardSave(state), force=True
        )

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the template's shapes/shardings (template = an
        abstract or concrete TrainState with the desired NamedShardings)."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

        # Orbax can return scalars/leaves without the template's (replicated)
        # sharding; re-place every leaf so jitted steps see uniform devices.
        def replace(t, r):
            if hasattr(t, "sharding") and hasattr(r, "dtype"):
                return jax.device_put(r, t.sharding)
            return r

        return jax.tree.map(replace, state_template, restored)

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
