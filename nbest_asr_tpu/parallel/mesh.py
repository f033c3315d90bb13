"""Device mesh + sharding rules (the comm layer the reference never had —
SURVEY.md §2.4: no DP/TP/NCCL anywhere in the reference; this is the
green-field TPU design of §5.8/§7 step 5).

Axes:
- ``dcn``   — (optional) slice axis for multi-slice deployments: data
  parallelism whose gradient all-reduce crosses the data-center network,
  not ICI.  Parameters stay replicated over it; only the batch is split,
  so exactly one psum per step rides DCN (the cheapest possible layout —
  scaling-book multi-slice recipe).  Created only when ``n_dcn > 1`` so
  single-slice meshes keep their 2-axis specs.
- ``data``  — in-slice batch dimension; gradients are reduced over it by
  XLA (sharded batch + replicated-or-sharded params => psum over ICI
  inserted automatically under jit with sharding annotations).
- ``model`` — tensor parallelism over attention heads / FFN hidden dim;
  XLA inserts the two all-reduces per layer (after attn-out and ffn-out
  projections), riding ICI.

The same code runs on any device set — real v5e slice or the
``xla_force_host_platform_device_count`` virtual CPU mesh used in tests
and in `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None,
              n_dcn: int = 1) -> Mesh:
    """(dcn x) data x model mesh.  Device order: JAX orders multi-slice
    device lists slice-major, so reshaping (n_dcn, n_data, n_model) keeps
    the ``data``/``model`` axes inside one slice's ICI domain and ``dcn``
    across slices."""
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        assert total % (n_model * n_dcn) == 0
        n_data = total // (n_model * n_dcn)
    need = n_dcn * n_data * n_model
    assert need <= total, (
        f"mesh {n_dcn}x{n_data}x{n_model} > {total} devices")
    if n_dcn > 1:
        devs = np.asarray(devices[:need]).reshape(n_dcn, n_data, n_model)
        return Mesh(devs, axis_names=("dcn", "data", "model"))
    devs = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def dp_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The mesh axes the batch dimension is sharded over."""
    return tuple(a for a in ("dcn", "data") if a in mesh.axis_names)


def _spec_for(path_str: str, ndim: int, tensor_parallel: bool) -> P:
    """Partition rule for one parameter leaf (paths from the model pytree:
    encoder/layers/<name>, encoder/embeddings/<name>, head/<name>)."""
    if not tensor_parallel:
        return P()
    # stacked layer tensors carry a leading (num_layers,) axis
    if "qkv_kernel" in path_str:        # (L, h, 3h) — split heads
        return P(None, None, "model")
    if "qkv_bias" in path_str:          # (L, 3h)
        return P(None, "model")
    if "attn_out_kernel" in path_str:   # (L, h, h) — split contracting dim
        return P(None, "model", None)
    if "ffn_in_kernel" in path_str:     # (L, h, i)
        return P(None, None, "model")
    if "ffn_in_bias" in path_str:       # (L, i)
        return P(None, "model")
    if "ffn_out_kernel" in path_str:    # (L, i, h)
        return P(None, "model", None)
    if "embeddings/word" in path_str:   # (V, h) — shard vocab rows
        return P("model", None)
    return P()


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = False):
    """Pytree of NamedShardings mirroring ``params``."""
    def one(path, leaf):
        s = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in path)
        return NamedSharding(mesh, _spec_for(s, leaf.ndim, tensor_parallel))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh, with_accum_axis: bool = False
                   ) -> NamedSharding:
    """Batch arrays are sharded over the data-parallel axes (dcn+data) on
    their batch dim.  With gradient accumulation the arrays carry a leading
    (n_accum,) axis that stays replicated."""
    axes = dp_axes(mesh)
    if with_accum_axis:
        return NamedSharding(mesh, P(None, axes))
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
