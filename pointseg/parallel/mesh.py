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


def create_hybrid_mesh(
    axes: tuple[str, ...] = ("data", "model"),
    ici_shape: tuple[int, ...] | None = None,
    dcn_axis: str = "data",
    *,
    devices=None,
    process_count: int | None = None,
    local_device_count: int | None = None,
) -> Mesh:
    """Multi-host mesh: `dcn_axis` spans hosts over DCN, everything
    else stays on-slice over ICI.

    SURVEY §5 comm-backend row: ICI for in-slice collectives, DCN for
    multi-host. The placement rule is standard: the DATA axis is the
    only one whose collective (the once-per-step gradient all-reduce)
    tolerates DCN latency, so it spans hosts; tensor/point axes need
    per-layer all-gathers and must ride ICI. Built on
    jax.experimental.mesh_utils.create_hybrid_device_mesh; in a
    single-process run this degenerates to `create_mesh` (so the same
    code path runs from 1 chip to multi-host — untestable beyond one
    process in this environment, by construction of the recipe).

    Args:
        axes: mesh axis names.
        ici_shape: per-host device grid (default: all local devices on
            the first non-DCN axis).
        dcn_axis: the axis that spans hosts.
        devices / process_count / local_device_count: overrides for the
            global runtime topology (default: jax.devices() etc.) —
            lets tests drive the multi-host placement without a real
            multi-process runtime, and callers compose meshes over a
            device subset.
    """
    n_proc = process_count if process_count is not None \
        else jax.process_count()
    local = local_device_count if local_device_count is not None \
        else jax.local_device_count()
    if devices is None:
        devices = jax.devices()
    if ici_shape is None:
        # all local devices on one axis: the first non-DCN axis in a
        # multi-host run (the DCN axis is the host grid), the first
        # axis outright in a single-process run
        wide = (next((i for i, a in enumerate(axes) if a != dcn_axis), 0)
                if n_proc > 1 else 0)
        ici_shape = tuple(
            local if i == wide else 1 for i in range(len(axes)))
    if n_proc == 1:
        return create_mesh(devices, axes=axes, shape=ici_shape)
    from jax.experimental import mesh_utils

    dcn_shape = tuple(n_proc if a == dcn_axis else 1 for a in axes)
    # TPU devices carry slice_index (the physical ICI-slice id — the
    # correct DCN granule); platforms without it (CPU multi-process,
    # some GPU builds) group by process instead of crashing on the
    # missing attribute
    grid = mesh_utils.create_hybrid_device_mesh(
        ici_shape, dcn_shape, devices=devices,
        process_is_granule=not hasattr(devices[0], "slice_index"))
    return Mesh(grid, axes)


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
    """TP sharding for one weight array.

    Placement policy (column-parallel first, row-parallel fallback —
    the Megatron pairing, expressed as GSPMD placements; XLA inserts
    the all-gathers/reduce-scatters the consumers need):

    1. ndim>=2 with last dim divisible and >= min_size: split OUTPUT
       channels over `axis` (column parallel).
    2. else ndim>=2 with dim -2 divisible and >= min_size: split INPUT
       channels (row parallel) — covers head convs / narrow-out Dense
       like (1024, num_classes) whose wide dim is the input
       (VERDICT round-2 weak #5: output-only sharding replicated them).
    3. 1-D vectors (BN scale/bias, biases) divisible and >= min_size:
       split — they follow the output-channel sharding of their layer.

    min_size guards against shards smaller than is useful on real
    hardware; per-shard widths ideally stay multiples of the 128-lane
    on TPU, so min_size=128 with tp=2 keeps 64-wide shards the floor.
    """
    shape = getattr(x, "shape", ())
    if axis not in mesh.axis_names:
        return NamedSharding(mesh, P())
    tp = mesh.shape[axis]
    if len(shape) >= 2 and shape[-1] >= min_size and shape[-1] % tp == 0:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
    if len(shape) >= 2 and shape[-2] >= min_size and shape[-2] % tp == 0:
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 2)), axis, None))
    if len(shape) == 1 and shape[0] >= min_size and shape[0] % tp == 0:
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P())


def sharded_param_fraction(params: Any, mesh: Mesh, axis: str = "model",
                           min_size: int = 128) -> float:
    """Fraction of parameter ELEMENTS that tensor_parallel_sharding
    actually splits over `axis` (reporting aid for the multichip
    dryrun: how much of each model TP really covers)."""
    total = sharded = 0
    for leaf in jax.tree.leaves(params):
        n = int(np.prod(getattr(leaf, "shape", ())) or 1)
        total += n
        spec = tensor_parallel_sharding(mesh, leaf, axis, min_size).spec
        if any(s is not None for s in spec):
            sharded += n
    return sharded / max(total, 1)


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
