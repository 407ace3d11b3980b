#!/usr/bin/env python
"""Main training entry point — same UX as the reference's train.py:

    python train.py {PointNet|PointNet++|PointNeXt|DeepGraphCnn} [flags]

(reference train.py:41-43; flags default to the reference configuration:
Adam lr=1e-3, 10 epochs, batch 8/2, 4096 points/block, test area 6,
14 classes, log interval 20 — train.py:17-37.)

All subcommands (prepare / evaluate / benchmark / train-legacy) live in
`python -m pointseg <subcommand>`.
"""

import sys

from pointseg.cli import main

if __name__ == "__main__":
    raise SystemExit(main(["train", *sys.argv[1:]]))
