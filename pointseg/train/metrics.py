"""Segmentation metrics over zero-padded variable-length batches.

Rebuild of Training/metrics.py from the reference. The reference loops
in Python over batch elements (and over classes for IoU/confusion) with
a `.item()` device sync per term; here everything is a masked einsum /
segment-sum so each metric is a single jittable XLA program and can run
inside the training step.

All functions take:
    predictions: (B, N, C) class scores — argmax is taken, so logits or
        softmax probabilities give identical results (the reference
        insists on softmax first; argmax makes that irrelevant).
    labels: (B, N, C) one-hot labels (padded rows are all-zero).
    lengths: (B,) valid lengths.

Semantics notes (parity with the reference):
- Label membership for IoU/confusion uses the one-hot channel directly
  (`labels[..., c] == 1`, metrics.py:104), not argmax of labels — an
  all-zero (padded) row belongs to no class. We keep that.
- mIoU uses eps=1e-6 smoothing on both numerator and denominator
  (metrics.py:95,110) so absent classes contribute IoU 1.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointseg.train.loss import length_mask


def _argmax_and_mask(predictions, labels, lengths):
    pred = jnp.argmax(predictions, axis=-1)  # (B, N)
    lab = jnp.argmax(labels, axis=-1)  # (B, N)
    mask = length_mask(lengths, predictions.shape[1])  # (B, N)
    return pred, lab, mask


def update_accuracy(
    predictions: jax.Array, labels: jax.Array, lengths: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(correct, total) point counts — the streaming form
    (reference metrics.py:28-50)."""
    pred, lab, mask = _argmax_and_mask(predictions, labels, lengths)
    correct = jnp.sum((pred == lab) & mask)
    total = jnp.sum(mask)
    return correct, total


def overall_accuracy(
    predictions: jax.Array, labels: jax.Array, lengths: jax.Array
) -> jax.Array:
    """Overall accuracy over non-padding points (reference metrics.py:3-25)."""
    correct, total = update_accuracy(predictions, labels, lengths)
    return correct / jnp.maximum(total, 1)


def confusion_matrix(
    predictions: jax.Array, labels: jax.Array, lengths: jax.Array
) -> jax.Array:
    """(C, C) confusion matrix, rows = true class, cols = predicted
    (reference metrics.py:52-78). One masked einsum instead of a
    B×C×C Python loop."""
    num_classes = labels.shape[-1]
    pred, _, mask = _argmax_and_mask(predictions, labels, lengths)
    pred_onehot = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    lab_onehot = (labels == 1).astype(jnp.float32)  # channel-exact, padded rows are 0
    m = mask.astype(jnp.float32)[..., None]
    return jnp.einsum(
        "bni,bnj->ij", lab_onehot * m, pred_onehot, preferred_element_type=jnp.float32
    ).astype(jnp.int32)


def update_intersection_over_union(
    predictions: jax.Array, labels: jax.Array, lengths: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-class (intersections, unions) — the streaming form
    (reference metrics.py:115-142)."""
    num_classes = labels.shape[-1]
    pred, _, mask = _argmax_and_mask(predictions, labels, lengths)
    pred_onehot = jax.nn.one_hot(pred, num_classes, dtype=jnp.float32)
    lab_onehot = (labels == 1).astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    pred_m = pred_onehot * m
    lab_m = lab_onehot * m
    inter = jnp.sum(pred_m * lab_m, axis=(0, 1))  # (C,)
    union = jnp.sum(jnp.maximum(pred_m, lab_m), axis=(0, 1))  # (C,)
    return inter, union


def intersection_over_union(
    predictions: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
    eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """(mIoU, per-class IoUs) with eps smoothing (reference metrics.py:81-112)."""
    inter, union = update_intersection_over_union(predictions, labels, lengths)
    ious = (inter + eps) / (union + eps)
    return jnp.mean(ious), ious


def iou_from_totals(
    intersections: jax.Array, unions: jax.Array, eps: float = 1e-6
) -> tuple[jax.Array, jax.Array]:
    """Finalize streamed I/U totals into (mIoU, per-class IoUs)
    (reference training.py:130-131)."""
    ious = (intersections + eps) / (unions + eps)
    return jnp.mean(ious), ious


def accuracy_from_one_hot(labels: jax.Array, predictions: jax.Array) -> jax.Array:
    """Legacy-stack accuracy: argmax-vs-argmax mean over ALL positions,
    padding included (reference Training/train_model.py:63-83)."""
    return jnp.mean(
        (jnp.argmax(labels, -1) == jnp.argmax(predictions, -1)).astype(jnp.float32)
    )
