"""Instrumented legacy-stack trainer + config-closure factory.

Rebuild of models/dgcnn/train_model.py (the reference's "enhanced"
DGCNN trainer): per-batch throughput/ETA/device-memory progress
(reference :61-90), epoch summaries (:259-280), records extended with
`epoch_times`, `total_time` and the full `config` (:295-313), a
`create_dgcnn_trainer(**config)` closure with the reference's defaults
(k=40, emb_dims=1024, cut=8192, sampling=0.5, epochs=50, 14 classes,
:319-336), and `quick_test_model` — a random-input forward smoke test
with timing and memory telemetry (:476-520).
"""

from __future__ import annotations

import time
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointseg.data.s3dis import S3DIS_CLASSES
from pointseg.train.legacy import preprocess_batch_to_train_format
from pointseg.train.logging import save_records
from pointseg.train.state import TrainState, create_train_state, eval_step, train_step
from pointseg.utils.memory import format_memory_usage


def train_epoch_with_progress(
    state: TrainState,
    train_loader: Iterable,
    mapping: Sequence[str],
    rng_key: jax.Array,
    cut: int | None,
    sampling: float | None,
    np_rng: np.random.Generator,
    epoch: int,
    num_epochs: int,
    log_every: int = 10,
    verbose: bool = True,
) -> tuple[TrainState, float]:
    """Legacy train epoch with rate/ETA/memory postfix
    (reference train_model.py:14-118)."""
    losses = []
    batches = 0
    n_total = len(train_loader)
    t0 = time.time()
    points_seen = 0

    for bi, batch in enumerate(train_loader):
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
        points_seen += int(lengths.sum())
        if verbose and (bi + 1) % log_every == 0:
            dt = time.time() - t0
            rate = (bi + 1) / dt
            eta = (n_total - bi - 1) / max(rate, 1e-9)
            print(
                f"Epoch {epoch + 1}/{num_epochs} [{bi + 1}/{n_total}] "
                f"loss={float(metrics['loss']):.4f} "
                f"{points_seen / dt:,.0f} pts/s eta={eta:.0f}s "
                f"| {format_memory_usage()}",
                flush=True,
            )
    # mean over processed batches (B==1 skips excluded; see legacy.py)
    total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
    return state, total / max(len(losses), 1)


def evaluate_with_progress(
    state: TrainState,
    test_loader: Iterable,
    mapping: Sequence[str],
    cut: int | None,
    np_rng: np.random.Generator,
) -> tuple[float | None, float | None]:
    """(reference train_model.py:121-168); eval never subsamples."""
    losses = []
    correct = None
    total = None
    batches = 0
    for batch in test_loader:
        points, labels, lengths, cont = preprocess_batch_to_train_format(
            batch["x"], batch["y"], mapping, cut=cut, sampling=None, rng=np_rng
        )
        batches += 1
        if not cont:
            continue
        out = eval_step(
            state, jnp.asarray(points), jnp.asarray(labels), jnp.asarray(lengths)
        )
        losses.append(out["loss"])
        correct = out["correct"] if correct is None else correct + out["correct"]
        total = out["total"] if total is None else total + out["total"]
    if batches == 0 or not losses:
        return None, None
    return (
        float(jnp.sum(jnp.stack(losses))) / len(losses),
        float(correct) / max(float(total), 1.0),
    )


def train_model_with_detailed_progress(
    state: TrainState,
    train_loader: Iterable,
    test_loader: Iterable,
    mapping: Sequence[str],
    epochs: int = 50,
    cut: int | None = 8192,
    sampling: float | None = 0.5,
    records_dir: str | None = None,
    records_filename: str = "records",
    config: dict | None = None,
    seed: int = 0,
    verbose: bool = True,
) -> tuple[TrainState, dict]:
    """Full instrumented run with timing records
    (reference train_model.py:171-316)."""
    np_rng = np.random.default_rng(seed)
    key = jax.random.key(seed)
    records = {
        "train_loss": [],
        "val_loss": [],
        "val_acc": [],
        "epoch_times": [],
        "config": config or {},
    }
    t_start = time.time()
    for epoch in range(epochs):
        t0 = time.time()
        state, train_loss = train_epoch_with_progress(
            state, train_loader, mapping, jax.random.fold_in(key, epoch),
            cut, sampling, np_rng, epoch, epochs, verbose=verbose,
        )
        val_loss, val_acc = evaluate_with_progress(
            state, test_loader, mapping, cut, np_rng
        )
        dt = time.time() - t0
        records["train_loss"].append(train_loss)
        records["val_loss"].append(val_loss)
        records["val_acc"].append(val_acc)
        records["epoch_times"].append(dt)
        if verbose:
            print(
                f"=== Epoch {epoch + 1}/{epochs} done in {dt:.1f}s | "
                f"train {train_loss:.4f} | val {val_loss} | acc {val_acc} | "
                f"{format_memory_usage()}",
                flush=True,
            )
    records["total_time"] = time.time() - t_start
    if records_dir is not None:
        save_records(records_dir, records_filename, records)
    return state, records


def create_dgcnn_trainer(**config):
    """Config-closure trainer factory (reference train_model.py:319-473).

    Defaults mirror the reference's recommended configuration; override
    any via kwargs. Returns `train(train_loader, test_loader) ->
    (state, records)`.
    """
    cfg = {
        "num_classes": 14,
        "k": 40,
        "emb_dims": 1024,
        "dropout": 0.5,
        "learning_rate": 1e-3,
        "epochs": 50,
        "cut": 8192,
        "sampling": 0.5,
        "mapping": S3DIS_CLASSES,
        "records_dir": None,
        "records_filename": "dgcnn_records",
        "seed": 0,
        "verbose": True,
    }
    cfg.update(config)

    def train(train_loader, test_loader):
        from pointseg.models import DGCNNWithColor

        model = DGCNNWithColor(
            num_classes=cfg["num_classes"],
            k=cfg["k"],
            emb_dims=cfg["emb_dims"],
            dropout=cfg["dropout"],
        )
        example = jnp.zeros((2, min(cfg["cut"] or 4096, 4096), 6), jnp.float32)
        state = create_train_state(
            model, example, cfg["learning_rate"], seed=cfg["seed"]
        )
        return train_model_with_detailed_progress(
            state,
            train_loader,
            test_loader,
            cfg["mapping"],
            epochs=cfg["epochs"],
            cut=cfg["cut"],
            sampling=cfg["sampling"],
            records_dir=cfg["records_dir"],
            records_filename=cfg["records_filename"],
            config={k: v for k, v in cfg.items() if k != "mapping"},
            seed=cfg["seed"],
            verbose=cfg["verbose"],
        )

    return train, cfg


def quick_test_model(
    num_classes: int = 14, k: int = 16, emb_dims: int = 256, n_points: int = 4096,
    verbose: bool = True,
) -> dict:
    """Random-input forward smoke test with timing + memory
    (reference train_model.py:476-520)."""
    from pointseg.models import DGCNNWithColor

    model = DGCNNWithColor(num_classes=num_classes, k=k, emb_dims=emb_dims)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, n_points, 6)).astype(np.float32))
    # jitted: eager init is ~3 ms/op over the relayed TPU runtime
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.key(0), x)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    t0 = time.time()
    out = fwd(variables, x)
    jax.device_get(out.ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    out = fwd(variables, x)
    jax.device_get(out.ravel()[0])
    steady_s = time.time() - t0

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    result = {
        "output_shape": tuple(out.shape),
        "compile_time_s": compile_s,
        "steady_time_s": steady_s,
        "num_params": n_params,
        "memory": format_memory_usage(),
    }
    if verbose:
        print(f"quick_test_model: out {out.shape}, params {n_params:,}")
        print(f"compile {compile_s:.2f}s, steady {steady_s * 1000:.2f}ms")
        print(result["memory"])
    return result
