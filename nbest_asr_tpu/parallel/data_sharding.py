"""Per-process (multi-host) input sharding.

The single-controller Trainer keeps whole splits device-resident and
gathers microbatches by row index (`train_step.py`) — fine up to one host.
On a multi-host mesh no process holds the full split, so inputs are built
the pjit way instead: every process loads ONLY its shard of each global
batch and `jax.make_array_from_process_local_data` assembles the global
array across processes (the scaling-book data-loading recipe).  The
resulting arrays feed `make_train_step(..., data_mode="direct")`.

The same call is exact on a single process (it degenerates to a sharded
device_put), which is how `__graft_entry__.dryrun_multichip` and the CPU
virtual-mesh tests exercise this path without real multi-host hardware.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import dp_axes


def microbatch_sharding(mesh, *, lead: int = 1) -> NamedSharding:
    """Sharding for direct-mode microbatch stacks: ``lead`` leading
    time-like axes (n_accum, or steps_per_call x n_accum for chained
    steps) stay unsharded; the batch dim after them is split over the
    data-parallel axes."""
    axes = dp_axes(mesh)
    return NamedSharding(mesh, P(*([None] * lead), axes))


def process_sharded_batch(mesh, local: Dict[str, np.ndarray],
                          *, lead: int = 1
                          ) -> Dict[str, jax.Array]:
    """Assemble global microbatch arrays from per-process host shards.

    ``local``: this process's rows of each stream, shaped
    (*lead_dims, local_b, ...) with ``lead`` leading time-like axes
    (local_b = global micro_b / n_processes along the dp axes this
    process covers).  Returns global jax.Arrays of shape
    (*lead_dims, global_b, ...) sharded over dcn+data.
    """
    sh = microbatch_sharding(mesh, lead=lead)
    return {
        k: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*sh.spec, *([None] * (v.ndim - len(
                sh.spec))))), np.ascontiguousarray(v))
        for k, v in local.items()
    }


def global_batch_size(mesh, per_device_batch: int) -> int:
    """Global microbatch rows for a given per-device batch."""
    n_dp = 1
    for a in dp_axes(mesh):
        n_dp *= mesh.shape[a]
    return per_device_batch * n_dp
