"""Device mesh and sharding rules.

TPU-native replacement for the reference's distributed layer, which is
torch FSDP `full_shard auto_wrap` per decoder layer over NCCL
(run_train.sh:42-43, utils/kd_trainer.py:172-255, train.py:43). Here the
whole topology is one `jax.sharding.Mesh` with named axes

    ('data', 'fsdp', 'tp')

and sharding is declared per-parameter with `NamedSharding`; GSPMD inserts
the all-gathers/reduce-scatters that torch FSDP performs imperatively
(SURVEY.md §2.4). ZeRO-2/3 and tensor parallelism are just different
PartitionSpec choices over the same mesh.

Sharding layout:
  * stacked layer weights `[L, in, out]` — column-parallel projections
    (q/k/v/gate/up) shard `in` over fsdp and `out` over tp; row-parallel
    (o/down) shard `in` over tp and `out` over fsdp, so TP collectives are
    the classic Megatron pair and FSDP gathers ride the other dim;
  * embed `[V, H]` / lm_head `[H, V]` shard the vocab dim over tp and the
    hidden dim over fsdp;
  * norm scales are replicated (tiny);
  * the batch is sharded over ('data', 'fsdp') — with tp=1 this is plain
    FSDP data parallelism like the reference's 8-way run.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "fsdp", "tp")


def make_mesh(
    data: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    pp: int = 1,
    cp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the global mesh. ``fsdp=-1`` absorbs all remaining devices.

    ``pp``/``cp`` > 1 append a pipeline / context (ring-attention) axis —
    the trainer routes the student forward through parallel.pipeline /
    models.llama_cp when those axes are present (VERDICT round-2 item 7)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp == -1:
        fsdp = n // (data * tp * pp * cp)
    if data * fsdp * tp * pp * cp != n:
        raise ValueError(
            f"mesh {data}x{fsdp}x{tp}x{pp}x{cp} != {n} devices"
        )
    axes = list(MESH_AXES)
    shape = [data, fsdp, tp]
    if pp > 1:
        axes.append("pp")
        shape.append(pp)
    if cp > 1:
        axes.append("cp")
        shape.append(cp)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def param_specs(tie_word_embeddings: bool = False) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``models.llama.init_params`` structure."""
    specs = {
        "embed": P("tp", "fsdp"),
        "layers": {
            "attn_norm": P(None, None),
            "q": P(None, "fsdp", "tp"),
            "k": P(None, "fsdp", "tp"),
            "v": P(None, "fsdp", "tp"),
            "o": P(None, "tp", "fsdp"),
            "mlp_norm": P(None, None),
            "gate": P(None, "fsdp", "tp"),
            "up": P(None, "fsdp", "tp"),
            "down": P(None, "tp", "fsdp"),
        },
        "final_norm": P(None),
    }
    if not tie_word_embeddings:
        specs["lm_head"] = P("fsdp", "tp")
    return specs


def batch_spec() -> P:
    """Token batches shard over the combined data-parallel axes."""
    return P(("data", "fsdp"), None)


def named(mesh: Mesh, tree):
    """Map a PartitionSpec pytree to a NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh, specs=None):
    """Place a (host-resident) param pytree onto the mesh."""
    if specs is None:
        specs = param_specs("lm_head" not in params)
    return jax.device_put(params, named(mesh, specs))
