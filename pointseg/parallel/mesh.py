"""Device mesh + sharding for SPMD training.

The reference is single-device (SURVEY.md §2 parallelism table: no DDP,
no process groups, no comm backend). The TPU-native equivalent is
GSPMD: a `jax.sharding.Mesh` with a `data` axis for batch-parallel
training (gradient all-reduce riding ICI comes out of XLA's SPMD
partitioner — no NCCL-style calls) and a `points` axis available for
spatial sharding of the N axis in whole-room eval (the reference's
"sequence parallel" analogue, SURVEY.md §5 long-context).

Single chip is the degenerate 1-device mesh: the same jitted train step
runs unchanged from 1 to N devices.

BatchNorm under DP needs no axis_name plumbing: batch statistics are
global-batch means/variances, and with the batch axis sharded, XLA
turns those reductions into cross-replica collectives automatically.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Sequence[jax.Device] | None = None,
    axes: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """A mesh over all (or the given) devices.

    Default: 1-D `data` mesh. Pass axes=("data", "points") and a shape
    to split devices between batch and point-axis parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: tuple, axis: str = "data") -> tuple:
    """device_put a (points, labels, lengths, ...) tuple batch-sharded."""
    s = batch_sharding(mesh, axis)
    return tuple(jax.device_put(np.asarray(x), s) for x in batch)


def shard_state(mesh: Mesh, state: Any) -> Any:
    """Replicates a TrainState's arrays across the mesh (pure DP: params
    replicated, grads all-reduced by XLA)."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), state)
