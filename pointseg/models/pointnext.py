"""PointNeXt for semantic segmentation.

Rebuild of models/PointNeXt/PointNeXt.py:17-147: a per-point stem
MLP(9 -> 32), four SA stages (same centroid counts/radii/widths as
PointNet++ but with grouping_norm=True), each followed by InvResMLP
blocks — 1 / 2 / 1 / 1, where the stage-2 pair uses radii 0.1 then 0.2
(PointNeXt.py:49-50) and stage 4 groups K=16 because only 16 points
remain (PointNeXt.py:58) — then the same FeaturePropagation decoder,
Dropout(0.5) and a class head. Returns raw logits (B, N, classes).

The reference's `version` ctor arg is accepted-but-unused
(PointNeXt.py:22); here stage widths scale with `width` so -S/-B/-L
style scaling is expressible (default matches the reference exactly).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointseg.nn import FeaturePropagation, InvResMLP, SetAbstraction, SharedMLP


class PointNeXt(nn.Module):
    num_classes: int = 14
    width: int = 32  # stem width; reference uses 32 (PointNeXt.py:39)
    dropout: float = 0.5  # reference rate (PointNeXt.py:76); 0 disables
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        d = self.dtype
        w = self.width

        coords0 = x[..., :3]
        f0 = SharedMLP([w], dtype=d, name="stem")(x, train=train)  # (B, N, w)

        c1, f1 = SetAbstraction(
            1024, 0.1, [w, w, 2 * w], grouping_norm=True, dtype=d, name="sa1"
        )(coords0, f0, train=train, mask=mask)
        c1, f1 = InvResMLP(0.1, 2 * w, 32, dtype=d, name="irmlp1")(
            c1, f1, train=train
        )

        c2, f2 = SetAbstraction(
            256, 0.2, [2 * w, 2 * w, 4 * w], grouping_norm=True, dtype=d, name="sa2"
        )(c1, f1, train=train)
        c2, f2 = InvResMLP(0.1, 4 * w, 32, dtype=d, name="irmlp2")(
            c2, f2, train=train
        )
        c2, f2 = InvResMLP(0.2, 4 * w, 32, dtype=d, name="irmlp2_1")(
            c2, f2, train=train
        )

        c3, f3 = SetAbstraction(
            64, 0.4, [4 * w, 4 * w, 8 * w], grouping_norm=True, dtype=d, name="sa3"
        )(c2, f2, train=train)
        c3, f3 = InvResMLP(0.4, 8 * w, 32, dtype=d, name="irmlp3")(
            c3, f3, train=train
        )

        c4, f4 = SetAbstraction(
            16, 0.8, [8 * w, 8 * w, 16 * w], grouping_norm=True, dtype=d, name="sa4"
        )(c3, f3, train=train)
        # only 16 points remain -> K=16 (reference PointNeXt.py:58)
        c4, f4 = InvResMLP(0.8, 16 * w, 16, dtype=d, name="irmlp4")(
            c4, f4, train=train
        )

        f3 = FeaturePropagation([256, 256], dtype=d, name="fp4")(c3, c4, f3, f4, train=train)
        f2 = FeaturePropagation([256, 256], dtype=d, name="fp3")(c2, c3, f2, f3, train=train)
        f1 = FeaturePropagation([256, 128], dtype=d, name="fp2")(c1, c2, f1, f2, train=train)
        f0 = FeaturePropagation([128, 128, 128, 128], dtype=d, name="fp1")(
            coords0, c1, f0, f1, train=train
        )

        h = nn.Dropout(self.dropout, deterministic=not train)(f0)
        logits = nn.Dense(self.num_classes, dtype=d, name="conv")(h)
        return logits.astype(jnp.float32)
