#!/usr/bin/env python
"""Cross-framework TRAINING parity: torch reference vs pointseg.

The north-star accuracy criterion (Area-5 mIoU parity) needs real
S3DIS, which this image does not have. This harness is the strongest
available substitute (VERDICT.md round-1 next#8): train the actual
PyTorch reference (mounted read-only at /root/reference) and this
framework on IDENTICAL synthetic block batches — same geometry-derived
labels, same batch composition per step — then compare final whole-set
evaluation metrics. Unit-level goldens prove the pieces are equal;
this proves the composed training systems LEARN equivalently.

Identical inputs: batches come from one pointseg Loader (seeded) and
are materialized per epoch, so both frameworks see byte-identical
(points, onehot, lengths) sequences. Remaining nondeterminism is
each framework's own init / dropout / FPS draws, so metrics agree to
within training noise, not bitwise — tolerance is configurable.

Torch side reproduces the reference training path exactly:
model(x: (B,N,9)) -> masked_onehot_cross_entropy (Training/
train_model.py:15-59) -> Adam(lr) (train.py:79). Eval metrics for BOTH
frameworks are computed by the same numpy/JAX metric code
(pointseg.train.metrics, itself golden-tested vs Training/metrics.py).

Writes a JSON comparison table (--out TRAIN_PARITY.json); exit 0 iff
|mIoU gap| <= --tol.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = os.environ.get("POINTSEG_REFERENCE", "/root/reference")


def build_data(args):
    from pointseg.data.datasets import BlockDataset, Loader
    from pointseg.data.synthetic import make_block_dataset

    if not os.path.exists(os.path.join(args.data_dir, "area_1")):
        make_block_dataset(
            args.data_dir, areas=(1, 2), rooms_per_area=args.rooms_per_area,
            points_per_room=args.points_per_room, seed=args.seed,
        )
    train_ds = BlockDataset(args.data_dir, {1}, sampling=args.npoints,
                            seed=args.seed)
    test_ds = BlockDataset(args.data_dir, {2}, sampling=None, seed=args.seed + 1)
    train = Loader(train_ds, args.batch_size, shuffle=True, drop_last=True,
                   pad_to=args.npoints, seed=args.seed, prefetch=0)
    # pad only to the batch max (rounded to 512) with ZERO filler — the
    # reference's own collate semantics (block_datasets.py:5-29). Heavy
    # static bucket padding is NOT parity-neutral: the zero cluster
    # shifts eval-mode BN statistics (measured -60 OA pts on pointseg,
    # and it penalizes torch too); parity must be judged under the
    # padding regime the reference actually evaluates with.
    test = Loader(test_ds, args.batch_size, shuffle=False, pad_to=None,
                  seed=0, prefetch=0, buckets=None)
    # materialize every epoch's batches once; both frameworks replay them
    epochs = [list(train) for _ in range(args.epochs)]
    test_batches = list(test)
    return epochs, test_batches


def eval_metrics(logits_list, labels_list, lengths_list, num_classes=14):
    """OA + mIoU over the whole set, identically for both frameworks."""
    import jax.numpy as jnp

    from pointseg.train import metrics as M

    correct = total = 0
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    for lg, lb, ln in zip(logits_list, labels_list, lengths_list):
        c, t = M.update_accuracy(jnp.asarray(lg), jnp.asarray(lb), jnp.asarray(ln))
        i, u = M.update_intersection_over_union(
            jnp.asarray(lg), jnp.asarray(lb), jnp.asarray(ln))
        correct += int(c)
        total += int(t)
        inter += np.asarray(i)
        union += np.asarray(u)
    present = union > 0
    ious = np.where(present, inter / np.maximum(union, 1e-9), 0.0)
    miou = float(ious[present].mean()) if present.any() else 0.0
    return {"oa": correct / max(total, 1), "miou": miou}


def train_torch(args, epochs, test_batches):
    sys.path.insert(0, REFERENCE)
    import torch

    from Training.train_model import masked_onehot_cross_entropy as ref_ce

    torch.manual_seed(args.seed)
    if args.model == "PointNet":
        from models.PointNet.PointNet import PointNetSeg as Ref
        model = Ref(part_classes=14)
    elif args.model == "PointNet++":
        from models.PointNetpp.PointNetpp import PointNetpp as Ref
        model = Ref(part_classes=14)
    else:
        raise SystemExit(f"unsupported reference model {args.model}")
    opt = torch.optim.Adam(model.parameters(), lr=args.learning_rate)

    t0 = time.perf_counter()
    model.train()
    for ep, batches in enumerate(epochs):
        for pts, onehot, lengths in batches:
            opt.zero_grad()
            out = model(torch.tensor(pts))
            loss = ref_ce(out, torch.tensor(onehot.astype(np.float32)),
                          torch.tensor(lengths))
            loss.backward()
            opt.step()
        print(f"  torch epoch {ep + 1}/{len(epochs)} loss={float(loss):.4f}",
              flush=True)
    train_s = time.perf_counter() - t0

    model.eval()
    logits, labels, lengths_l = [], [], []
    with torch.no_grad():
        for pts, onehot, lengths in test_batches:
            logits.append(model(torch.tensor(pts)).numpy())
            labels.append(onehot)
            lengths_l.append(lengths)
    m = eval_metrics(logits, labels, lengths_l)
    m["train_seconds"] = round(train_s, 1)
    return m


def train_pointseg(args, epochs, test_batches):
    import jax
    import jax.numpy as jnp

    from pointseg.models import create_model
    from pointseg.train.state import create_train_state, train_step

    model = create_model(args.model, num_classes=14)
    example = jnp.zeros((args.batch_size, args.npoints, 9), jnp.float32)
    state = create_train_state(model, example, args.learning_rate,
                               seed=args.seed)
    rng = jax.random.key(args.seed)

    t0 = time.perf_counter()
    for ep, batches in enumerate(epochs):
        erng = jax.random.fold_in(rng, ep)
        for pts, onehot, lengths in batches:
            state, metrics = train_step(
                state, jnp.asarray(pts), jnp.asarray(onehot),
                jnp.asarray(lengths), erng)
        print(f"  pointseg epoch {ep + 1}/{len(epochs)} "
              f"loss={float(metrics['loss']):.4f}", flush=True)
    train_s = time.perf_counter() - t0

    logits, labels, lengths_l = [], [], []
    for pts, onehot, lengths in test_batches:
        lg = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(pts), train=False)
        logits.append(np.asarray(lg))
        labels.append(onehot)
        lengths_l.append(lengths)
    m = eval_metrics(logits, labels, lengths_l)
    m["train_seconds"] = round(train_s, 1)
    return m


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="PointNet",
                    choices=["PointNet", "PointNet++"])
    ap.add_argument("--data-dir", default="/tmp/pointseg_train_parity")
    ap.add_argument("--rooms-per-area", type=int, default=4)
    ap.add_argument("--points-per-room", type=int, default=20000)
    ap.add_argument("--npoints", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tol", type=float, default=0.05,
                    help="max |mIoU gap| to pass")
    ap.add_argument("--tpu", action="store_true",
                    help="run the pointseg side on the TPU chip "
                         "(default: CPU, apples-to-apples with torch)")
    ap.add_argument("--out", default="TRAIN_PARITY.json")
    args = ap.parse_args()

    if not args.tpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    print(f"building data under {args.data_dir} ...", flush=True)
    epochs, test_batches = build_data(args)
    n_train = sum(len(b) for b in epochs) // max(len(epochs), 1)
    print(f"{n_train} train batches/epoch x {len(epochs)} epochs, "
          f"{len(test_batches)} test batches", flush=True)

    print(f"training torch reference {args.model} ...", flush=True)
    ref = train_torch(args, epochs, test_batches)
    print(f"training pointseg {args.model} ...", flush=True)
    ours = train_pointseg(args, epochs, test_batches)

    gap = {k: round(ours[k] - ref[k], 4) for k in ("oa", "miou")}
    result = {
        "model": args.model,
        "epochs": args.epochs,
        "batches_per_epoch": n_train,
        "npoints": args.npoints,
        "reference_torch": ref,
        "pointseg": ours,
        "gap": gap,
        "tol": args.tol,
        "pass": abs(gap["miou"]) <= args.tol,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
