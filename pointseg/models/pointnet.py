"""PointNet for semantic segmentation.

Rebuild of models/PointNet/PointNet.py: TNet(k=9) input transform,
per-point MLP 64 -> (optional TNet(64) feature transform) -> 128 -> 1024,
global max-pool, global feature tiled and concatenated with the 64-d
point features (1088), segmentation head 512-256-128-classes.

Deviations from the reference (deliberate, SURVEY.md §2 L4 quirks):
- returns raw logits; the reference returns hand-rolled softmax
  probabilities (PointNet.py:147-149) which its own criterion then
  log-softmaxes again (a double softmax). Standardizing on logits gives
  every model the same contract.
- input is channels-last (B, N, 9) with no internal transposes; the
  reference transposes to channels-first (PointNet.py:137).
- optional `mask` keeps padded points out of the global max-pool (the
  reference lets padded zeros contribute).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointseg import ops
from pointseg.nn import SharedMLP, TNet


class PointNetEncoder(nn.Module):
    """Shared MLP + TNets; emits per-point features cat(global, local).

    With ``global_feat=True`` it instead returns only the pooled (B, 1024)
    global feature — the classification configuration of the reference
    encoder (PointNet.py:44, 85-87).
    """

    in_dim: int = 9
    feature_transform: bool = False
    global_feat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        B, N, _ = x.shape
        trans = TNet(k=self.in_dim, dtype=self.dtype, name="stn")(
            x, train=train, mask=mask
        )
        x = jnp.einsum("bnd,bde->bne", x.astype(trans.dtype), trans)
        x = SharedMLP([64], dtype=self.dtype, name="mlp1")(x, train=train)

        if self.feature_transform:
            ftrans = TNet(k=64, dtype=self.dtype, name="fstn")(
                x, train=train, mask=mask
            )
            x = jnp.einsum("bnd,bde->bne", x, ftrans)

        point_feat = x  # (B, N, 64)
        x = SharedMLP([128], dtype=self.dtype, name="mlp2")(x, train=train)
        # final 1024 layer is conv+BN with NO relu before the max-pool
        # (reference PointNet.py:81-83)
        x = nn.Dense(1024, dtype=self.dtype, name="conv3")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn3",
        )(x)
        if mask is not None:
            global_feat = ops.masked_reduce(x, mask, "max", axis=1)
        else:
            global_feat = jnp.max(x, axis=1)  # (B, 1024)
        if self.global_feat:
            return global_feat  # (B, 1024)
        tiled = jnp.broadcast_to(global_feat[:, None, :], (B, N, 1024))
        return jnp.concatenate([tiled, point_feat], axis=-1)  # (B, N, 1088)


class PointNetCls(nn.Module):
    """PointNet classification head (reference PointNet.py:93-117).

    Global-feature encoder -> fc 512 -> 256 -> num_classes with
    BatchNorm + ReLU + Dropout(0.3) between the fully-connected layers.
    The reference never trains this class from any of its entry points,
    but it is part of its public model surface; it is kept out of the
    segmentation MODEL_REGISTRY because its contract differs (per-cloud
    (B, num_classes) logits, not per-point).

    Deviation (same contract as every model here): returns raw logits;
    the reference returns ``log_softmax`` (PointNet.py:116).
    """

    num_classes: int = 40
    in_dim: int = 9
    feature_transform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        h = PointNetEncoder(
            in_dim=self.in_dim,
            feature_transform=self.feature_transform,
            global_feat=True,
            dtype=self.dtype,
            name="feat",
        )(x, train=train, mask=mask)  # (B, 1024)
        for i, width in enumerate((512, 256)):
            h = nn.Dense(width, dtype=self.dtype, name=f"fc{i + 1}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i + 1}",
            )(h)
            h = nn.relu(h)
            h = nn.Dropout(rate=0.3, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc3")(h)
        return logits.astype(jnp.float32)


class PointNetSeg(nn.Module):
    """PointNet segmentation head over the encoder (PointNet.py:119-150)."""

    num_classes: int = 14
    in_dim: int = 9
    feature_transform: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        h = PointNetEncoder(
            in_dim=self.in_dim,
            feature_transform=self.feature_transform,
            dtype=self.dtype,
            name="feat",
        )(x, train=train, mask=mask)
        h = SharedMLP([512, 256, 128], dtype=self.dtype, name="head")(h, train=train)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="conv4")(h)
        return logits.astype(jnp.float32)
