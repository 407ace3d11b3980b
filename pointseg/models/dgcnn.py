"""DGCNN (dynamic graph CNN) for semantic segmentation.

Rebuild of models/dgcnn/dgcnn.py:80-273: four EdgeConv layers
(3->64->64->64->128) whose kNN graph is recomputed from the *features*
of every layer (the "dynamic" graph), multi-scale concat (320), a
Conv->emb_dims global per-point feature, and a 512-256-classes head
with dropout. `DGCNNWithColor` adds a parallel Dense(3->64) color
branch concatenated before the global feature (384 total).

Contract changes vs the reference (SURVEY.md §2 L4 quirks, resolved):
- channels-last input; the unified (B, N, 9) block format is accepted
  directly — xyz = [..., :3], rgb = [..., 3:6] — so DGCNNWithColor is
  usable from the main train CLI (the reference's expects (B, 6, N)
  channels-first and is incompatible with its own train.py).
- returns raw logits (B, N, classes); pass `return_features=True` for
  the (logits, per-point embedding) pair the reference's 3-tuple
  carried (dgcnn.py:162).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointseg.nn import EdgeConv, SharedMLP, leaky_relu_02


class DGCNN(nn.Module):
    """Geometry-only DGCNN (reference dgcnn.py:80-162).

    `static_graph=True` (opt-in, DEVIATION from the reference) computes
    the kNN graph ONCE on xyz and reuses it in every EdgeConv instead
    of re-running kNN in each layer's feature space. Layer 1 is
    identical either way (its graph IS the xyz graph); layers 2-4 lose
    the "dynamic" feature-space neighborhoods. kNN selection is 4 x
    ~5 ms of the 72.7 ms bf16 step (FUSION_TABLE_r03_dgcnn.json), so
    this trades graph dynamics for ~20% step time; parameters and
    checkpoints are identical across modes."""

    num_classes: int = 14
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.float32
    static_graph: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None, return_features: bool = False):
        # Accept (B, N, 3), (B, N, 6) or the block format (B, N, 9);
        # only xyz builds the first graph (reference dgcnn.py:134-137).
        xyz = x[..., :3]
        d = self.dtype

        idx = None
        if self.static_graph:
            from pointseg import ops

            idx = ops.knn_indices(xyz.astype(d), self.k, mask=mask)
        x1 = EdgeConv(64, self.k, dtype=d, name="conv1")(xyz, train=train, mask=mask, idx=idx)
        x2 = EdgeConv(64, self.k, dtype=d, name="conv2")(x1, train=train, mask=mask, idx=idx)
        x3 = EdgeConv(64, self.k, dtype=d, name="conv3")(x2, train=train, mask=mask, idx=idx)
        x4 = EdgeConv(128, self.k, dtype=d, name="conv4")(x3, train=train, mask=mask, idx=idx)

        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B, N, 320)
        x5 = SharedMLP(
            [self.emb_dims], act=leaky_relu_02, use_bias=False, dtype=d, name="conv5"
        )(x_cat, train=train)

        h = jnp.concatenate([x_cat, x5], axis=-1)
        h = SharedMLP([512], act=leaky_relu_02, use_bias=False, dtype=d, name="conv6")(
            h, train=train
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = SharedMLP([256], act=leaky_relu_02, use_bias=False, dtype=d, name="conv7")(
            h, train=train
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=d, name="conv8")(h)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, x5
        return logits


class DGCNNWithColor(nn.Module):
    """DGCNN + parallel RGB branch (reference dgcnn.py:165-257).
    `static_graph` as in DGCNN."""

    num_classes: int = 14
    k: int = 20
    emb_dims: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.float32
    static_graph: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None, return_features: bool = False):
        if x.shape[-1] < 6:
            raise ValueError(
                f"DGCNNWithColor expects >=6 channels (xyz+rgb), got {x.shape[-1]}"
            )
        xyz = x[..., :3]
        rgb = x[..., 3:6]
        d = self.dtype

        idx = None
        if self.static_graph:
            from pointseg import ops

            idx = ops.knn_indices(xyz.astype(d), self.k, mask=mask)
        x1 = EdgeConv(64, self.k, dtype=d, name="conv1")(xyz, train=train, mask=mask, idx=idx)
        x2 = EdgeConv(64, self.k, dtype=d, name="conv2")(x1, train=train, mask=mask, idx=idx)
        x3 = EdgeConv(64, self.k, dtype=d, name="conv3")(x2, train=train, mask=mask, idx=idx)
        x4 = EdgeConv(128, self.k, dtype=d, name="conv4")(x3, train=train, mask=mask, idx=idx)

        color = SharedMLP(
            [64], act=leaky_relu_02, use_bias=False, dtype=d, name="color_conv"
        )(rgb, train=train)

        x_cat = jnp.concatenate([x1, x2, x3, x4, color], axis=-1)  # (B, N, 384)
        x5 = SharedMLP(
            [self.emb_dims], act=leaky_relu_02, use_bias=False, dtype=d, name="conv5"
        )(x_cat, train=train)

        h = jnp.concatenate([x_cat, x5], axis=-1)
        h = SharedMLP([512], act=leaky_relu_02, use_bias=False, dtype=d, name="conv6")(
            h, train=train
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = SharedMLP([256], act=leaky_relu_02, use_bias=False, dtype=d, name="conv7")(
            h, train=train
        )
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=d, name="conv8")(h)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, x5
        return logits


def get_model(num_classes: int = 14, use_color: bool = True, **kwargs):
    """Factory mirroring the reference's get_model (dgcnn.py:260-273)."""
    cls = DGCNNWithColor if use_color else DGCNN
    return cls(num_classes=num_classes, **kwargs)


def get_loss():
    """Loss factory for API parity with the reference (dgcnn.py:276-280,
    unused there too): returns the framework's masked CE."""
    from pointseg.train.loss import masked_onehot_cross_entropy

    return masked_onehot_cross_entropy
