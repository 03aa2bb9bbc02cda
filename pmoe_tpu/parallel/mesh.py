"""Device meshes and sharding rules.

The reference trains on a single GPU (conf/stage_0.yaml: device "cuda:0"; no
torch.distributed anywhere — SURVEY §2.9). The TPU framework makes scaling a
first-class capability:

* ``data`` axis — batch sharding (data parallelism); gradients are combined by
  XLA-inserted all-reduce over ICI when the loss is jitted with sharded inputs.
* ``expert`` axis — the stacked-expert parameter axis of
  :class:`pmoe_tpu.models.moe.MixtureOfExperts` can be sharded so each device
  holds K/E experts (expert parallelism for the *dense* MoE: every expert sees
  every sample, so the only collective is the output-stack all-gather XLA
  inserts automatically).

Shardings are expressed with ``NamedSharding`` and applied via ``jax.jit``
in/out shardings + ``jax.lax.with_sharding_constraint`` — we never hand-write
collectives for the train step; XLA lays them on ICI.

Why only (data, expert) axes: the PMoE model family is conv-dominated with
<= ~40 M params per replica — tensor parallelism would shard 3x3 convs whose
per-device tiles fall below MXU efficiency, and pipeline parallelism has
nothing to pipeline (the whole model fits one chip with room for batch 128).
Sequence "length" is T=4 frames folded into channels (SURVEY §5: no
attention, no ring/Ulysses analog warranted). DP carries the batch; EP
shards the only weight-disjoint axis (the stacked experts). Both compose on
one mesh and are exercised by tests/test_sharding.py and the driver's
dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_params",
           "shard_batch", "expert_sharding_rules"]


def make_mesh(devices: Sequence | None = None, data: int | None = None,
              expert: int = 1) -> Mesh:
    """Build a (data, expert) mesh. Defaults to all devices on the data axis.

    The data axis is the innermost (fastest-varying over ICI neighbors) so
    gradient all-reduces ride nearest-neighbor links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // expert
    if data < 1 or data * expert != n:
        raise ValueError(
            f"cannot build a {data}x{expert} (data x expert) mesh from {n} "
            f"device(s); need data*expert == n_devices with data >= 1 "
            f"(hint: on a single-chip host, force virtual devices with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N)")
    arr = np.asarray(devices).reshape(expert, data)
    return Mesh(arr, axis_names=("expert", "data"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """device_put every array in ``batch`` with its leading dim over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def expert_sharding_rules(path_str: str, ndim: int) -> tuple:
    """PartitionSpec entries for a parameter at ``path_str``.

    Parameters under the stacked-expert scope ('experts/...') carry a leading
    expert axis — shard it over the 'expert' mesh axis; everything else is
    replicated.
    """
    if "experts/" in path_str and ndim >= 1:
        return ("expert",) + (None,) * (ndim - 1)
    return (None,) * ndim


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Apply :func:`expert_sharding_rules` across a parameter pytree."""
    from jax import tree_util

    def place(path, leaf):
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
        spec = expert_sharding_rules("/".join(parts), np.ndim(leaf))
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return tree_util.tree_map_with_path(place, params)
