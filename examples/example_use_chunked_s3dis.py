#!/usr/bin/env python
"""Dataset smoke demo for the chunked room dataset + index timing.

Mirror of the reference's example_use_chunked_s3dis.py and
test_precomputed_index.py: compares precomputed-index vs on-the-fly
indexing init times, times batch fetch, prints shapes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pointseg.data.datasets import ChunkedRoomDataset, create_chunked_dataloaders  # noqa: E402
from pointseg.data.prepare import precompute_chunk_index  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-path", default="data_chunked")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--compare", action="store_true",
                    help="Also time on-the-fly index building.")
    args = ap.parse_args()

    if args.synthetic and not os.path.exists(
        os.path.join(args.data_path, "s3dis1_chunk1.npz")
    ):
        from pointseg.data import synthetic

        synthetic.make_chunked_dataset(args.data_path, chunks_per_area=2)
        print(f"Generated synthetic chunks under {args.data_path}")

    precompute_chunk_index(args.data_path)

    t0 = time.time()
    ds = ChunkedRoomDataset(args.data_path)
    t_pre = time.time() - t0
    print(f"Precomputed-index init: {t_pre:.4f}s, {len(ds)} rooms")

    if args.compare:
        t0 = time.time()
        ds_fly = ChunkedRoomDataset(args.data_path, require_index_file=False)
        import json

        idx_path = os.path.join(args.data_path, "chunked_index.json")
        os.rename(idx_path, idx_path + ".bak")
        try:
            t0 = time.time()
            ds_fly = ChunkedRoomDataset(args.data_path, require_index_file=False)
            t_fly = time.time() - t0
        finally:
            os.rename(idx_path + ".bak", idx_path)
        print(f"On-the-fly init: {t_fly:.4f}s ({t_fly / max(t_pre, 1e-9):.1f}x slower)")
        assert len(ds_fly) == len(ds)

    t0 = time.time()
    sample = ds[0]
    print(f"First sample: {time.time() - t0:.4f}s, x {sample['x'].shape}, "
          f"area {sample['area']}")

    train_loader, test_loader = create_chunked_dataloaders(args.data_path, batch_size=2)
    t0 = time.time()
    batch = next(iter(train_loader))
    print(f"First batch: {time.time() - t0:.4f}s, B={len(batch['x'])}, "
          f"shapes {[x.shape for x in batch['x']]}")


if __name__ == "__main__":
    main()
