"""The modern training harness.

Rebuild of Training/training.py:29-180: per-epoch train loop with
periodic train-batch metrics logging, full-test-set streaming
evaluation (OA, per-class IoU/mIoU, confusion matrix), per-epoch
scalars + per-class IoU tensor logging, and stdout epoch summaries.

TPU-shaped differences:
- the whole step (fwd+bwd+Adam+metrics) is one jitted program
  (`pointseg.train.state.train_step`); metric accumulation stays on
  device and is fetched once per log interval / epoch end;
- batches stream through a prefetching host loader and are
  device-put asynchronously;
- checkpointing is periodic with resume (the reference saves only at
  the very end, train.py:88 — SURVEY.md §5 calls for improving this).
"""

from __future__ import annotations

import time
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from pointseg.io.checkpoint import save_checkpoint
from pointseg.train import metrics as M
from pointseg.train.logging import MetricsLogger
from pointseg.train.state import (
    TrainState, eval_step, train_step, train_step_accum,
)


def _dev(x):
    """Host batches need the H2D put; device-resident batches (the
    DeviceEpochLoader path) must pass through UNTOUCHED — on the
    relayed runtime `jnp.asarray` on an already-committed jax.Array
    costs a ~45 ms round trip per array per step (measured: 154 vs
    18 ms/step for the same loop)."""
    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def train_epoch(
    state: TrainState,
    train_loader: Iterable,
    rng: jax.Array,
    logger: MetricsLogger | None,
    log_interval: int,
    global_step: int,
    verbose: bool = True,
    scan_steps: int = 1,
    accum_steps: int = 1,
) -> tuple[TrainState, float, int]:
    """One pass over the training set (reference training.py:29-78).

    `scan_steps > 1` with a `DeviceEpochLoader` fuses (sample -> step)
    into one `lax.scan` program dispatched once per K steps — same
    batch sequence and rng streams, host-dispatch cost /K
    (`pointseg.data.device._sample_train_scan`). Per-interval logging
    still happens, from the stacked per-step metrics.

    `accum_steps > 1` groups K consecutive loader batches into ONE
    optimizer update via `train_step_accum` (gradient accumulation —
    effective batch K*B at single-batch peak memory). A short trailing
    group still accumulates (a second jitted shape, compiled once).
    Mutually exclusive with `scan_steps`.
    """
    from pointseg.data.device import DeviceEpochLoader

    if accum_steps > 1:
        if scan_steps > 1:
            raise ValueError("scan_steps and accum_steps are mutually exclusive")
        if isinstance(train_loader, DeviceEpochLoader):
            # _train_epoch_accum stacks batches with np.asarray — on a
            # device loader every micro-batch would pay a silent
            # device->host round trip (~30 ms+ each on the relay)
            raise ValueError(
                "accum_steps > 1 requires a host loader; the device "
                "store path fuses sampling on HBM and cannot be "
                "host-stacked (drop --device-data or --accum-steps)")
        return _train_epoch_accum(
            state, train_loader, rng, logger, log_interval, global_step,
            accum_steps,
        )

    if scan_steps > 1 and isinstance(train_loader, DeviceEpochLoader):
        state, ms = train_loader.scan_epoch(state, rng, scan_steps)
        n = int(ms["loss"].shape[0]) if ms else 0
        if logger is not None and n:
            # one fetch for the whole epoch's stacked metrics
            loss_h, acc_h, miou_h = (
                np.asarray(ms["loss"]), np.asarray(ms["accuracy"]),
                np.asarray(ms["miou"]),
            )
            for i in range(0, n, log_interval):
                logger.add_scalar("Train/Loss", float(loss_h[i]),
                                  global_step + i)
                logger.add_scalar("Train/Accuracy", 100.0 * float(acc_h[i]),
                                  global_step + i)
                logger.add_scalar("Train/Mean_IoU", 100.0 * float(miou_h[i]),
                                  global_step + i)
        total_loss = float(jnp.mean(ms["loss"])) if n else 0.0
        return state, total_loss, global_step + n

    # Losses accumulate as device scalars; ONE host sync per epoch (a
    # per-batch float() costs a full host round trip — on the relayed
    # runtime that dwarfed the 20ms step itself).
    losses = []
    num_batches = 0
    for batch_index, (points, labels, lengths) in enumerate(train_loader):
        state, metrics = train_step(
            state, _dev(points), _dev(labels), _dev(lengths), rng,
        )
        if logger is not None and batch_index % log_interval == 0:
            # host sync only at the log interval
            logger.add_scalar("Train/Loss", float(metrics["loss"]), global_step)
            logger.add_scalar(
                "Train/Accuracy", 100.0 * float(metrics["accuracy"]), global_step
            )
            logger.add_scalar(
                "Train/Mean_IoU", 100.0 * float(metrics["miou"]), global_step
            )
        losses.append(metrics["loss"])
        num_batches += 1
        global_step += 1
    total_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
    return state, total_loss, global_step


def _train_epoch_accum(
    state: TrainState,
    train_loader: Iterable,
    rng: jax.Array,
    logger: MetricsLogger | None,
    log_interval: int,
    global_step: int,
    accum_steps: int,
) -> tuple[TrainState, float, int]:
    """Gradient-accumulation epoch: K loader batches -> one update.

    Batches are stacked on host (they are consecutive numpy loader
    outputs, so the H2D put ships one (K,B,...) array — fewer, larger
    transfers, which the relay prefers) and fed to `train_step_accum`.
    `global_step` counts OPTIMIZER updates, matching `state.step`.
    """
    losses = []
    group: list = []

    def flush(state, group, global_step, losses):
        stack = [np.stack(parts) for parts in zip(*group)]
        state, metrics = train_step_accum(
            state, _dev(stack[0]), _dev(stack[1]), _dev(stack[2]), rng,
        )
        if logger is not None and global_step % log_interval == 0:
            logger.add_scalar("Train/Loss", float(metrics["loss"]), global_step)
            logger.add_scalar(
                "Train/Accuracy", 100.0 * float(metrics["accuracy"]), global_step
            )
            logger.add_scalar(
                "Train/Mean_IoU", 100.0 * float(metrics["miou"]), global_step
            )
        losses.append(metrics["loss"])
        return state, global_step + 1

    for points, labels, lengths in train_loader:
        group.append((np.asarray(points), np.asarray(labels),
                      np.asarray(lengths)))
        if len(group) == accum_steps:
            state, global_step = flush(state, group, global_step, losses)
            group = []
    if group:
        state, global_step = flush(state, group, global_step, losses)
    total_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
    return state, total_loss, global_step


def evaluate(
    state: TrainState,
    test_loader: Iterable,
    num_classes: int = 14,
    step_fn=None,
) -> dict:
    """Streaming evaluation over the test set (training.py:80-133).

    `step_fn` defaults to the jitted running-average-BN `eval_step`;
    pass `make_eval_step(model, bn_stats="batch")` for test-time BN
    adaptation (pointseg/train/state.py)."""
    if step_fn is None:
        step_fn = eval_step
    # all accumulation stays on device; one host sync at the end
    losses = []
    num_batches = 0
    correct = jnp.zeros((), jnp.int32)
    total = jnp.zeros((), jnp.int32)
    inter = jnp.zeros((num_classes,), jnp.float32)
    union = jnp.zeros((num_classes,), jnp.float32)
    confusion = jnp.zeros((num_classes, num_classes), jnp.int32)

    for points, labels, lengths in test_loader:
        out = step_fn(state, _dev(points), _dev(labels), _dev(lengths))
        losses.append(out["loss"])
        num_batches += 1
        correct = correct + out["correct"]
        total = total + out["total"]
        inter = inter + out["intersections"]
        union = union + out["unions"]
        confusion = confusion + out["confusion"]

    mean_iou, ious = M.iou_from_totals(inter, union)
    # per-class recall + its mean, matching the reference's
    # mean_class_accuracy (models/dgcnn/utils.py:199-208: classes with
    # zero ground-truth points contribute 0.0 to the mean)
    conf = np.asarray(confusion)
    class_total = conf.sum(axis=1)
    class_acc = np.where(class_total > 0, np.diag(conf) / np.maximum(class_total, 1), 0.0)
    return {
        "loss": float(jnp.mean(jnp.stack(losses))) if losses else 0.0,
        "accuracy": float(correct) / max(float(total), 1.0),
        "mean_class_accuracy": float(class_acc.mean()) if len(class_acc) else 0.0,
        "class_accuracies": class_acc,
        "mean_iou": float(mean_iou),
        "ious": np.asarray(ious),
        "confusion": conf,
    }


def train_model(
    state: TrainState,
    train_loader: Iterable,
    test_loader: Iterable,
    num_epochs: int,
    log_interval: int = 20,
    logger: MetricsLogger | None = None,
    seed: int = 0,
    num_classes: int = 14,
    ckpt_dir: str | None = None,
    ckpt_every_epochs: int = 1,
    config: dict | None = None,
    verbose: bool = True,
    confusion_dir: str | None = None,
    scan_steps: int = 1,
    accum_steps: int = 1,
) -> tuple[TrainState, dict]:
    """Full training run (reference training.py:135-180).

    Returns the final state and a records dict
    {train_loss, val_loss, val_acc, val_miou, epoch_times, total_time}.
    """
    rng = jax.random.key(seed)
    global_step = int(state.step)
    records = {
        "train_loss": [],
        "val_loss": [],
        "val_acc": [],
        "val_miou": [],
        "epoch_times": [],
    }
    t_start = time.time()

    for epoch in range(num_epochs):
        t0 = time.time()
        epoch_rng = jax.random.fold_in(rng, epoch)
        state, train_loss, global_step = train_epoch(
            state, train_loader, epoch_rng, logger, log_interval, global_step,
            verbose=verbose, scan_steps=scan_steps, accum_steps=accum_steps,
        )
        ev = evaluate(state, test_loader, num_classes=num_classes)
        dt = time.time() - t0

        if verbose:
            print(f"Epoch {epoch + 1} completed ({dt:.1f}s):")
            print(f"- Training loss: {train_loss}")
            print(f"- Validation loss: {ev['loss']}")
            print(f"- Validation accuracy: {ev['accuracy']}")
            print(f"- Validation mean IoU: {ev['mean_iou']}")
            print("-" * 15, flush=True)

        if logger is not None:
            logger.add_scalar("Train/Epoch_Loss", train_loss, epoch)
            logger.add_scalar("Val/Loss", ev["loss"], epoch)
            logger.add_scalar("Val/Accuracy", 100.0 * ev["accuracy"], epoch)
            logger.add_scalar("Val/Mean_Iou", 100.0 * ev["mean_iou"], epoch)
            logger.add_tensor("Val/Ious", 100.0 * ev["ious"], epoch)
            logger.flush()

        records["train_loss"].append(train_loss)
        records["val_loss"].append(ev["loss"])
        records["val_acc"].append(ev["accuracy"])
        records["val_miou"].append(ev["mean_iou"])
        records["epoch_times"].append(dt)

        if confusion_dir is not None:
            # per-epoch confusion heatmap — the reference wires this but
            # leaves it commented out (training.py:176)
            try:
                import os

                from pointseg.utils.visualize import plot_confusion_matrix

                os.makedirs(confusion_dir, exist_ok=True)
                plot_confusion_matrix(
                    ev["confusion"],
                    os.path.join(confusion_dir, f"confusion_epoch_{epoch + 1}.png"),
                )
            except ImportError:
                pass  # matplotlib not installed

        if ckpt_dir is not None and (epoch + 1) % ckpt_every_epochs == 0:
            save_checkpoint(ckpt_dir, state, config=config)

    records["total_time"] = time.time() - t_start
    if config is not None:
        records["config"] = config
    return state, records
