#!/usr/bin/env python
"""Dataset smoke demo for the monolithic room dataset.

Mirror of the reference's example_use_s3dis.py: times dataset init and
first-sample access, prints label distribution and coordinate/color
statistics. Run with --synthetic to generate fake data first.
"""

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointseg.data.datasets import RoomDataset, create_s3dis_dataloaders  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="data")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    if args.synthetic and not os.path.exists(
        os.path.join(args.data_path, "s3dis1.npz")
    ):
        from pointseg.data import synthetic

        synthetic.make_area_dataset(args.data_path)
        print(f"Generated synthetic areas under {args.data_path}")

    t0 = time.time()
    ds = RoomDataset(args.data_path)
    print(f"Dataset init: {time.time() - t0:.3f}s, {len(ds)} rooms")

    t0 = time.time()
    sample = ds[0]
    print(f"First sample: {time.time() - t0:.3f}s")
    print(f"  x shape: {sample['x'].shape}, area {sample['area']}")

    counts = collections.Counter(sample["y"])
    print("  label distribution:", dict(counts.most_common(5)))

    xyz = sample["x"][:, :3]
    rgb = sample["x"][:, 3:6]
    print(f"  xyz min {xyz.min(0)}, max {xyz.max(0)}")
    print(f"  rgb mean {rgb.mean(0)}")

    train_loader, test_loader = create_s3dis_dataloaders(args.data_path)
    t0 = time.time()
    batch = next(iter(train_loader))
    print(f"First train batch: {time.time() - t0:.3f}s, B={len(batch['x'])}")


if __name__ == "__main__":
    main()
