"""PointNet++ for semantic segmentation (SSG and MSG variants).

Rebuild of models/PointNetpp/PointNetpp.py:6-48 — the SSG encoder
SA(1024, r=0.1, [32,32,64]) -> SA(256, 0.2, [64,64,128]) ->
SA(64, 0.4, [128,128,256]) -> SA(16, 0.8, [256,256,512]) and decoder
FP(768,[256,256]) -> FP(384,[256,256]) -> FP(320,[256,128]) ->
FP(128,[128,128,128,128]) -> Dropout(0.5) -> Dense(classes).

Input contract: (B, N, 9) channels-last; coords = [..., :3],
features = [..., 3:] (reference PointNetpp.py:29-30). Returns raw
logits (B, N, classes).

The MSG variant (multi-scale grouping with radius-nested ball queries)
is listed in the reference's target configs (BASELINE.json configs[3])
but absent from its code; stage radii/Ks follow the PointNet++ paper's
S3DIS MSG recipe scaled to the same centroid counts.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointseg.nn import FeaturePropagation, SetAbstraction, SetAbstractionMSG


class PointNetPP(nn.Module):
    """Single-scale-grouping PointNet++ (the reference's variant)."""

    num_classes: int = 14
    dropout: float = 0.5  # reference rate (PointNetpp.py:24); 0 disables
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        coords0 = x[..., :3]
        feats0 = x[..., 3:]

        d = self.dtype
        c1, f1 = SetAbstraction(1024, 0.1, [32, 32, 64], dtype=d, name="sa1")(
            coords0, feats0, train=train, mask=mask
        )
        c2, f2 = SetAbstraction(256, 0.2, [64, 64, 128], dtype=d, name="sa2")(
            c1, f1, train=train
        )
        c3, f3 = SetAbstraction(64, 0.4, [128, 128, 256], dtype=d, name="sa3")(
            c2, f2, train=train
        )
        c4, f4 = SetAbstraction(16, 0.8, [256, 256, 512], dtype=d, name="sa4")(
            c3, f3, train=train
        )

        f3 = FeaturePropagation([256, 256], dtype=d, name="fp4")(
            c3, c4, f3, f4, train=train
        )
        f2 = FeaturePropagation([256, 256], dtype=d, name="fp3")(
            c2, c3, f2, f3, train=train
        )
        f1 = FeaturePropagation([256, 128], dtype=d, name="fp2")(
            c1, c2, f1, f2, train=train
        )
        f0 = FeaturePropagation([128, 128, 128, 128], dtype=d, name="fp1")(
            coords0, c1, None, f1, train=train
        )

        h = nn.Dropout(self.dropout, deterministic=not train)(f0)
        logits = nn.Dense(self.num_classes, dtype=d, name="conv")(h)
        return logits.astype(jnp.float32)


class PointNetPPMSG(nn.Module):
    """Multi-scale-grouping PointNet++ (radius-nested ball queries)."""

    num_classes: int = 14
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        coords0 = x[..., :3]
        feats0 = x[..., 3:]
        d = self.dtype

        c1, f1 = SetAbstractionMSG(
            1024, (0.05, 0.1), (16, 32),
            ([16, 16, 32], [32, 32, 64]), dtype=d, name="sa1",
        )(coords0, feats0, train=train, mask=mask)  # -> 96
        c2, f2 = SetAbstractionMSG(
            256, (0.1, 0.2), (16, 32),
            ([64, 64, 128], [64, 96, 128]), dtype=d, name="sa2",
        )(c1, f1, train=train)  # -> 256
        c3, f3 = SetAbstractionMSG(
            64, (0.2, 0.4), (16, 32),
            ([128, 196, 256], [128, 196, 256]), dtype=d, name="sa3",
        )(c2, f2, train=train)  # -> 512
        c4, f4 = SetAbstractionMSG(
            16, (0.4, 0.8), (16, 32),
            ([256, 256, 512], [256, 384, 512]), dtype=d, name="sa4",
        )(c3, f3, train=train)  # -> 1024

        f3 = FeaturePropagation([256, 256], dtype=d, name="fp4")(c3, c4, f3, f4, train=train)
        f2 = FeaturePropagation([256, 256], dtype=d, name="fp3")(c2, c3, f2, f3, train=train)
        f1 = FeaturePropagation([256, 128], dtype=d, name="fp2")(c1, c2, f1, f2, train=train)
        f0 = FeaturePropagation([128, 128, 128, 128], dtype=d, name="fp1")(
            coords0, c1, None, f1, train=train
        )

        h = nn.Dropout(self.dropout, deterministic=not train)(f0)
        logits = nn.Dense(self.num_classes, dtype=d, name="conv")(h)
        return logits.astype(jnp.float32)
