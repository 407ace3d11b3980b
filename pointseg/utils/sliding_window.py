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
"""

from __future__ import annotations

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
