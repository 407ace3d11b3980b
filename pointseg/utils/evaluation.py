"""Whole-room evaluation with sliding-window inference.

Rebuild of `evaluate_model` (reference models/dgcnn/utils.py:134-258):
batch-size-1 room loop, string labels -> indices, per-room
sliding-window prediction, then global metrics over all concatenated
predictions — overall accuracy, per-class accuracy + mean class
accuracy (absent classes count 0.0), per-class IoU + mIoU (absent
classes count 0.0 — NB these are the reference's *unsmoothed* whole-
room semantics, unlike the eps-smoothed streaming metrics of the
block stack, Training/metrics.py:110).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Sequence

import numpy as np

from pointseg.utils.sliding_window import (
    _bucket,
    _device_scene_confusion_fn,
    confusion_to_metrics,
    predict_single_scene,
)


def evaluate_rooms(
    forward: Callable,
    room_loader: Iterable,
    class_names: Sequence[str],
    window_size: int = 4096,
    overlap: int = 512,
    verbose: bool = True,
    stream: str = "device",
) -> dict:
    """Evaluates a per-window forward fn over whole rooms.

    Args:
        forward: jitted fn (points (1, W, D), lengths (1,)) -> logits.
        room_loader: yields dicts with 'x' (list of (N, D) arrays) and
            'y' (list of string-label lists) — the chunked/room loaders.
        class_names: label vocabulary (indices = class ids).
        stream: 'device' (default) keeps each room resident on the chip
            and scans windows inside one jitted program; 'host' runs
            the reference-shaped per-window loop. Identical results up
            to fp reassociation.
    """
    if stream not in ("device", "host"):
        raise ValueError("stream must be 'device' or 'host'")
    import jax.numpy as jnp

    num_classes = len(class_names)
    name_to_idx = {n: i for i, n in enumerate(class_names)}
    step = window_size - overlap

    t0 = time.time()
    rooms = 0
    if stream == "device":
        # fully asynchronous pipeline: every room is ONE fused H2D
        # (labels packed as the last channel), windows scan on device,
        # and (target, pred) pairs bin-count into a device-resident
        # (C, C) confusion matrix — the sufficient statistic for every
        # reported metric. Nothing blocks until the final fetch (a
        # periodic sync bounds in-flight transfer memory).
        confusion = jnp.zeros((num_classes, num_classes), jnp.int32)
        for batch in room_loader:
            for points, labels in zip(batch["x"], batch["y"]):
                points = np.asarray(points, np.float32)
                target = np.array(
                    [name_to_idx[l] for l in labels], np.float32
                )
                n, d = points.shape
                room_pad = _bucket(max(n + step, window_size))
                buf = np.full((room_pad, d + 1), -1.0, np.float32)
                buf[:n, :d] = points
                buf[:n, d] = target
                buf[n:, :d] = 0.0
                fn = _device_scene_confusion_fn(
                    forward, room_pad, window_size, step, num_classes
                )
                confusion = fn(
                    jnp.asarray(buf), jnp.asarray(n, jnp.int32), confusion
                )
                rooms += 1
                if rooms % 8 == 0:
                    # bound in-flight transfers; a host fetch, because
                    # block_until_ready does not block on the relay
                    import jax

                    jax.device_get(confusion.ravel()[0])
                if verbose and rooms % 10 == 0:
                    print(f"Processed {rooms} rooms", flush=True)
        results = confusion_to_metrics(np.asarray(confusion))
        results["class_names"] = list(class_names)
        results["evaluation_time"] = time.time() - t0
        class_accuracies = np.array(results["class_accuracies"])
        class_ious = np.array(results["class_ious"])
        total_points = results["total_points"]
    else:
        total_correct = 0
        total_points = 0
        class_correct = np.zeros(num_classes)
        class_total = np.zeros(num_classes)
        intersections = np.zeros(num_classes)
        unions = np.zeros(num_classes)

        for batch in room_loader:
            for points, labels in zip(batch["x"], batch["y"]):
                target = np.array([name_to_idx[l] for l in labels], np.int64)
                preds, _ = predict_single_scene(
                    forward, np.asarray(points), window_size=window_size,
                    overlap=overlap,
                )
                correct_mask = preds == target
                total_correct += int(correct_mask.sum())
                total_points += len(target)
                for c in range(num_classes):
                    cm = target == c
                    class_total[c] += int(cm.sum())
                    class_correct[c] += int((correct_mask & cm).sum())
                    pm = preds == c
                    intersections[c] += int(np.logical_and(pm, cm).sum())
                    unions[c] += int(np.logical_or(pm, cm).sum())
                rooms += 1
                if verbose and rooms % 10 == 0:
                    print(f"Processed {rooms} rooms", flush=True)

        class_accuracies = np.where(
            class_total > 0, class_correct / np.maximum(class_total, 1), 0.0)
        class_ious = np.where(
            unions > 0, intersections / np.maximum(unions, 1), 0.0)
        results = {
            "overall_accuracy": total_correct / max(total_points, 1),
            "mean_class_accuracy": float(class_accuracies.mean()),
            "mean_iou": float(class_ious.mean()),
            "class_accuracies": class_accuracies.tolist(),
            "class_ious": class_ious.tolist(),
            "class_names": list(class_names),
            "total_points": total_points,
            "evaluation_time": time.time() - t0,
        }
    if verbose:
        print("\n" + "=" * 60)
        print("EVALUATION RESULTS")
        print("=" * 60)
        print(f"Overall Accuracy: {results['overall_accuracy']:.4f}")
        print(f"Mean Class Accuracy: {results['mean_class_accuracy']:.4f}")
        print(f"Mean IoU: {results['mean_iou']:.4f}")
        print(f"Total Points: {total_points:,}")
        print(f"Evaluation Time: {results['evaluation_time']:.2f}s")
        print(f"\n{'Class':<12} {'Accuracy':<10} {'IoU':<10}")
        print("-" * 32)
        for i, name in enumerate(class_names):
            print(f"{name:<12} {class_accuracies[i]:<10.4f} {class_ious[i]:<10.4f}")
    return results
