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


def tensor_parallel_sharding(
    mesh: Mesh, x: Any, axis: str = "model", min_size: int = 128
) -> NamedSharding:
    """Output-channel sharding for one weight array: the last dimension
    splits over `axis` when divisible and wide enough; everything else
    replicates. With GSPMD this is column-parallel tensor parallelism —
    XLA inserts the all-gathers/reduces the consumers need."""
    shape = getattr(x, "shape", ())
    if (
        len(shape) >= 2
        and axis in mesh.axis_names
        and shape[-1] >= min_size
        and shape[-1] % mesh.shape[axis] == 0
    ):
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
    return NamedSharding(mesh, P())


def shard_state_tp(
    mesh: Mesh, state: Any, axis: str = "model", min_size: int = 128
) -> Any:
    """DP+TP state placement: wide weight matrices (and their optimizer
    moments, which share shapes) split their output channels over the
    `axis` mesh dimension; small arrays replicate. The reference has no
    model parallelism (SURVEY.md §2) — this is the optional TP axis its
    rebuild plan reserves."""

    def put(x):
        return jax.device_put(x, tensor_parallel_sharding(mesh, x, axis, min_size))

    return state.replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.tree.map(put, state.params),
        batch_stats=jax.tree.map(put, state.batch_stats),
        opt_state=jax.tree.map(put, state.opt_state),
    )
