"""The legacy/chunked training stack.

Rebuild of Training/train_model.py:89-288 — whole-room list batches with
string labels, host-side preprocessing (fractional random subsampling,
pad/truncate to min(batch_max, cut), string -> one-hot), the B==1 skip
(BatchNorm needs batch statistics), simple Adam training with per-epoch
evaluation, and records export.

TPU-shaped differences:
- preprocessing emits channels-LAST (B, N, D) batches (the uniform model
  contract) instead of the reference's (B, D, N) transpose (:162);
- batches pad to bucketed static lengths so the jitted step doesn't
  recompile per batch (`cut` also acts as the top bucket);
- the model is called as `logits = apply(points)` — the reference's
  3-tuple unpack (`outputs, _, _ = model(points)`, :187) only ever
  matched DGCNN and was stale for the other models (SURVEY.md §2 L4).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointseg.train.logging import save_records
from pointseg.train.state import TrainState, eval_step, train_step


def preprocess_batch_to_train_format(
    x: Sequence[np.ndarray],
    y: Sequence[Sequence[str]],
    mapping: Sequence[str],
    cut: int | None = None,
    sampling: float | None = None,
    rng: np.random.Generator | None = None,
    pad_multiple: int = 512,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Variable-length rooms -> padded arrays + one-hot labels.

    Mirrors the reference semantics (train_model.py:89-171): optional
    fractional sampling to max(int(N*s), 1) points without replacement,
    pad/truncate to min(batch_max, cut), labels one-hot via
    mapping.index, lengths clamped to cut, cont=False when B == 1.

    Returns (points (B, N, D) f32, labels (B, N, C) f32, lengths (B,),
    cont). N is rounded up to `pad_multiple` (static-shape bucketing;
    set pad_multiple=1 for exact reference shapes).
    """
    if sampling is not None and not (0 < sampling <= 1.0):
        raise ValueError(f"sampling must be in (0,1], got {sampling}")
    rng = rng or np.random.default_rng()

    if sampling is not None:
        xs, ys = [], []
        for xi, yi in zip(x, y):
            n = xi.shape[0]
            k = max(int(n * sampling), 1)
            perm = rng.permutation(n)[:k]
            xs.append(xi[perm])
            ys.append([yi[j] for j in perm])
        x, y = xs, ys

    lengths = np.array([xi.shape[0] for xi in x], np.int32)
    max_length = int(lengths.max())
    if cut is not None:
        max_length = min(max_length, cut)
    n_pad = int(math.ceil(max_length / pad_multiple) * pad_multiple) if pad_multiple > 1 else max_length
    if cut is not None:
        n_pad = min(n_pad, max(cut, max_length))

    B = len(x)
    D = x[0].shape[-1]
    C = len(mapping)
    index = {label: i for i, label in enumerate(mapping)}

    points = np.zeros((B, n_pad, D), np.float32)
    labels = np.zeros((B, n_pad, C), np.float32)
    for i, (xi, yi) in enumerate(zip(x, y)):
        n = min(xi.shape[0], max_length)
        points[i, :n] = xi[:n]
        codes = np.array([index.get(l, -1) for l in yi[:n]], np.int64)
        if (codes < 0).any():
            bad = sorted({l for l in yi[:n] if l not in index})
            raise ValueError(f"Labels not present in mapping: {bad}")
        labels[i, np.arange(n), codes] = 1.0

    lengths = np.minimum(lengths, max_length)
    return points, labels, lengths, B > 1


def train_epoch(
    state: TrainState,
    train_loader: Iterable,
    mapping: Sequence[str],
    rng_key: jax.Array,
    cut: int | None,
    sampling: float | None,
    np_rng: np.random.Generator,
) -> tuple[TrainState, float]:
    """(reference train_model.py:175-198)"""
    losses = []
    batches = 0
    for batch in train_loader:
        points, labels, lengths, cont = preprocess_batch_to_train_format(
            batch["x"], batch["y"], mapping, cut=cut, sampling=sampling, rng=np_rng
        )
        batches += 1
        if not cont:
            continue
        state, metrics = train_step(
            state, jnp.asarray(points), jnp.asarray(labels), jnp.asarray(lengths),
            rng_key,
        )
        losses.append(metrics["loss"])  # device scalar; one sync per epoch
    # mean over PROCESSED batches; the reference divides by the loader
    # length including skipped B==1 batches (train_model.py:198), which
    # understates the loss — deliberate fix
    total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
    return state, total / max(len(losses), 1)


def evaluate(
    state: TrainState,
    test_loader: Iterable,
    mapping: Sequence[str],
    cut: int | None,
    sampling: float | None,
    np_rng: np.random.Generator,
) -> tuple[float | None, float | None]:
    """Loss + length-weighted accuracy (reference train_model.py:201-224).
    NB the reference weights `accuracy_from_one_hot` (computed over ALL
    positions incl. padding) by real lengths; we weight the masked
    accuracy — the bug-fixed equivalent."""
    losses = []
    correct = None
    total = None
    batches = 0
    for batch in test_loader:
        points, labels, lengths, cont = preprocess_batch_to_train_format(
            batch["x"], batch["y"], mapping, cut=cut, sampling=sampling, rng=np_rng
        )
        batches += 1
        if not cont:
            continue
        out = eval_step(
            state, jnp.asarray(points), jnp.asarray(labels), jnp.asarray(lengths)
        )
        losses.append(out["loss"])  # device accumulation; one sync below
        correct = out["correct"] if correct is None else correct + out["correct"]
        total = out["total"] if total is None else total + out["total"]
    if batches == 0 or not losses:
        return None, None
    return (
        float(jnp.sum(jnp.stack(losses))) / len(losses),
        float(correct) / max(float(total), 1.0),
    )


def train_model(
    state: TrainState,
    train_loader: Iterable,
    test_loader: Iterable,
    mapping: Sequence[str],
    epochs: int = 20,
    print_records: bool = False,
    records_dir: str | None = None,
    records_filename: str | None = None,
    cut: int | None = None,
    sampling: float | None = None,
    seed: int = 0,
) -> tuple[TrainState, dict]:
    """The legacy loop (reference train_model.py:230-287)."""
    np_rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    train_losses, val_losses, val_metrics = [], [], []

    for epoch in range(epochs):
        epoch_key = jax.random.fold_in(key, epoch)
        state, train_loss = train_epoch(
            state, train_loader, mapping, epoch_key, cut, sampling, np_rng
        )
        val_loss, val_acc = evaluate(
            state, test_loader, mapping, cut, sampling, np_rng
        )
        train_losses.append(train_loss)
        val_losses.append(val_loss)
        val_metrics.append(val_acc)
        if print_records:
            print(f"Epoch {epoch + 1}/{epochs}")
            print(f"Train Loss: {train_loss}")
            print(f"Val Loss: {val_loss}, Val Accuracy: {val_acc}", flush=True)

    records = {
        "train_loss": train_losses,
        "val_loss": val_losses,
        "val_acc": val_metrics,
    }
    if records_dir is not None:
        save_records(records_dir, records_filename or "records", records)
    return state, records
