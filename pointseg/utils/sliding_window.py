"""Sliding-window whole-room inference with overlap averaging.

Rebuild of `predict_single_scene` (reference models/dgcnn/utils.py:67-131):
rooms too large for one forward pass are processed in fixed windows
(default 4096) with overlap (default 512); per-point logits are
accumulated and averaged over the number of windows covering each point,
then argmax + softmax confidence.

TPU shape discipline: every window forward uses the SAME static
(1, window, D) shape — the final short window is zero-padded with a
length mask instead of being a new shape (the reference lets the last
window shrink, utils.py:108, which on XLA would mean a recompile).

Two execution paths:

- `predict_single_scene` — the host loop: one device call + one D2H
  logits copy per window (reference-shaped; kept as the oracle).
- `predict_single_scene_device` — the streaming path: the whole room
  ships to HBM ONCE, a `lax.scan` walks every window inside a single
  jitted program (dynamic_slice window extraction, on-device overlap
  accumulation), and one D2H returns per-point predictions +
  confidences. On the relayed TPU runtime each host round-trip costs
  ~33 ms, so the host loop pays ~66 ms/window while the device path
  pays the two transfers once per ROOM. Room buffers are bucketed
  (power-of-two-ish) so each bucket size compiles once.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def predict_single_scene(
    forward: Callable[[jax.Array, jax.Array], jax.Array],
    points: np.ndarray,
    window_size: int = 4096,
    overlap: int = 512,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-point predictions for one (possibly huge) room.

    Args:
        forward: jitted fn (points (1, W, D), lengths (1,)) -> logits
            (1, W, C). Static window shape; padding masked via lengths.
        points: (N, D) room points.
        window_size: window length W.
        overlap: overlap between consecutive windows.

    Returns:
        (predictions (N,) int32, confidences (N,) f32).
    """
    n = points.shape[0]
    if n <= window_size:
        starts = [0]
    else:
        step = window_size - overlap
        starts = list(range(0, n - window_size + step, step))

    logits_sum = None
    counts = np.zeros((n,), np.float32)
    for s in starts:
        e = min(s + window_size, n)
        w = e - s
        buf = np.zeros((1, window_size, points.shape[1]), np.float32)
        buf[0, :w] = points[s:e]
        out = np.asarray(forward(jnp.asarray(buf), jnp.asarray([w])))[0, :w]
        if logits_sum is None:
            logits_sum = np.zeros((n, out.shape[-1]), np.float32)
        logits_sum[s:e] += out
        counts[s:e] += 1.0

    # points never covered (can't happen with this schedule, but guard)
    counts = np.maximum(counts, 1.0)
    avg = logits_sum / counts[:, None]
    preds = avg.argmax(-1).astype(np.int32)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(avg), axis=-1))
    conf = probs[np.arange(n), preds]
    return preds, conf


def _bucket(n: int, base: int = 4096, ratio: float = 1.25,
            quantum: int = 512) -> int:
    """Rounds a room size up to a GEOMETRIC bucket (x1.25 steps from
    4096, aligned to 512): compiling the scan program costs tens of
    seconds per distinct buffer size, so bucket count must stay
    logarithmic in the room-size range (real rooms span 1e4..3e6
    points) at the price of <=25% padded — masked — windows."""
    b = float(base)
    while b < n:
        b *= ratio
    return -(-int(b) // quantum) * quantum


@lru_cache(maxsize=None)
def _device_scene_fn(forward, room_pad: int, window_size: int, step: int,
                     num_classes: int, group: int = 8, mesh=None):
    """One jitted scan-over-windows program per (forward, buffer size).

    Windows run `group` at a time as one batched forward: the Pallas
    selection kernels pad any batch up to 8 sublanes anyway, so a
    batch-1 window forward wastes 8x kernel compute — grouping turns
    that padding into real work and amortizes per-call overheads.

    With a `mesh`, the group axis shards across its 'data' axis — the
    spatial "context parallel" of SURVEY.md §5: each chip forwards its
    share of the room's windows, the room array is replicated, and the
    overlap accumulation stays replicated (windows are independent, so
    the only communication is the logits all-gather XLA inserts).
    """
    max_windows = max(1, -(-max(room_pad - window_size, 0) // step) + 1)
    n_groups = -(-max_windows // group)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        win_sharding = NamedSharding(mesh, PartitionSpec("data", None, None))

    @jax.jit
    def predict(room, n):  # room (R, D) f32 on device, n () int32
        R, _ = room.shape

        # same schedule as the host loop: range(0, n - W + step, step)
        # when n > W, else the single start 0
        n_over = jnp.maximum(n - window_size, 0)
        num_win = jnp.where(
            n <= window_size, 1, (n_over + 2 * step - 1) // step
        )

        def body(carry, g):
            logits_sum, counts = carry
            win_ids = g * group + jnp.arange(group)          # (G,)
            active = win_ids < num_win
            starts = jnp.minimum(win_ids * step,
                                 jnp.maximum(R - window_size, 0))
            wins = jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    room, (s, 0), (window_size, room.shape[1]))
            )(starts)                                        # (G, W, D)
            wlens = jnp.clip(n - starts, 0, window_size)
            if mesh is not None:
                wins = jax.lax.with_sharding_constraint(wins, win_sharding)
            logits = forward(wins, wlens)                    # (G, W, C)
            masks = (jnp.arange(window_size)[None, :] < wlens[:, None]) \
                & active[:, None]                            # (G, W)
            # windows within a group can overlap, so accumulate them
            # sequentially (G static, unrolled)
            for j in range(group):
                s = starts[j]
                m = masks[j]
                seg = jax.lax.dynamic_slice(
                    logits_sum, (s, 0), (window_size, num_classes))
                logits_sum = jax.lax.dynamic_update_slice(
                    logits_sum,
                    seg + jnp.where(m[:, None], logits[j], 0.0), (s, 0))
                cseg = jax.lax.dynamic_slice(counts, (s,), (window_size,))
                counts = jax.lax.dynamic_update_slice(
                    counts, cseg + m.astype(jnp.float32), (s,))
            return (logits_sum, counts), None

        init = (jnp.zeros((R, num_classes), jnp.float32),
                jnp.zeros((R,), jnp.float32))
        (logits_sum, counts), _ = jax.lax.scan(
            body, init, jnp.arange(n_groups)
        )
        avg = logits_sum / jnp.maximum(counts, 1.0)[:, None]
        preds = jnp.argmax(avg, -1).astype(jnp.int32)
        probs = jax.nn.softmax(avg, -1)
        conf = jnp.take_along_axis(probs, preds[..., None], axis=-1)[..., 0]
        return preds, conf

    return predict


def predict_single_scene_device(
    forward: Callable[[jax.Array, jax.Array], jax.Array],
    points: np.ndarray,
    window_size: int = 4096,
    overlap: int = 512,
    num_classes: int = 14,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming `predict_single_scene`: whole room resident on device.

    Same schedule, same per-window forward, same overlap averaging as
    the host loop (equal up to fp reassociation — tested), but with ONE
    host->device transfer and ONE device->host fetch per room instead
    of two round-trips per window.

    The room buffer is padded past the last window's reach so every
    `dynamic_slice` start matches the host schedule exactly (a clamped
    start would silently change window contents).
    """
    n, d = points.shape
    step = window_size - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than window_size")
    # last host start is < n - W + step, so slices reach at most
    # n + step - 1; pad at least that far before bucketing
    room_pad = _bucket(max(n + step, window_size))
    buf = np.zeros((room_pad, d), np.float32)
    buf[:n] = points
    fn = _device_scene_fn(forward, room_pad, window_size, step, num_classes,
                          mesh=mesh)
    preds, conf = fn(jnp.asarray(buf), jnp.asarray(n, jnp.int32))
    return np.asarray(preds)[:n], np.asarray(conf)[:n]


@lru_cache(maxsize=None)
def _device_scene_confusion_fn(forward, room_pad: int, window_size: int,
                               step: int, num_classes: int):
    """Streaming whole-room CONFUSION-MATRIX accumulator.

    Wraps the window scan of `_device_scene_fn` but, instead of
    returning per-point predictions (a ~33 ms D2H relay fetch per
    room), bin-counts (target, argmax-prediction) pairs into a (C, C)
    confusion matrix ON DEVICE and adds it to a running total. The
    confusion matrix is a sufficient statistic for every whole-room
    metric the reference reports (overall accuracy = trace/total,
    class accuracy = diag/rowsum, IoU = diag/(row+col-diag)), so one
    room costs ONE fused H2D transfer (labels packed as an extra
    channel of the room buffer) and the only fetch is the final (C, C)
    matrix after ALL rooms.
    """
    inner = _device_scene_fn(forward, room_pad, window_size, step,
                             num_classes)

    @jax.jit
    def accumulate(room_and_labels, n, confusion):
        room = room_and_labels[:, :-1]
        target = room_and_labels[:, -1].astype(jnp.int32)
        preds, _ = inner(room, n)
        valid = (jnp.arange(room.shape[0]) < n) & (target >= 0)
        flat = jnp.where(valid, target * num_classes + preds, 0)
        upd = jnp.zeros((num_classes * num_classes,), jnp.int32).at[flat].add(
            valid.astype(jnp.int32)
        )
        return confusion + upd.reshape(num_classes, num_classes)

    return accumulate


def confusion_to_metrics(confusion: np.ndarray) -> dict:
    """Whole-room metrics from a confusion matrix (rows=target,
    cols=prediction) — same definitions as the reference's
    evaluate_model (models/dgcnn/utils.py:214-258)."""
    conf = np.asarray(confusion, np.float64)
    diag = np.diag(conf)
    row = conf.sum(1)
    col = conf.sum(0)
    union = row + col - diag
    class_acc = np.where(row > 0, diag / np.maximum(row, 1), 0.0)
    class_iou = np.where(union > 0, diag / np.maximum(union, 1), 0.0)
    total = conf.sum()
    return {
        "overall_accuracy": float(diag.sum() / max(total, 1)),
        "mean_class_accuracy": float(class_acc.mean()),
        "mean_iou": float(class_iou.mean()),
        "class_accuracies": class_acc.tolist(),
        "class_ious": class_iou.tolist(),
        "total_points": int(total),
    }
