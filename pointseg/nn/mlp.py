"""Shared point-MLP stacks.

Rebuild of `MiniPointNet` / `UnitPointNet` in the reference
(models/utils/common.py:125-178). The reference uses channels-first 1x1
Conv2d/Conv1d + BatchNorm + ReLU stacks; here everything is
channels-last, so each "1x1 conv" is an `nn.Dense` over the feature axis
— exactly the (points x channels) @ (channels x channels) matmul the MXU
wants, with no layout permutes anywhere.

One module serves both roles: `SharedMLP` applies over the last axis of
any-rank input ((B, N, F) per-point, or (B, C, K, F) per-neighbor).
BatchNorm normalizes over all non-feature axes, matching torch
BatchNorm1d/2d semantics for these layouts; momentum defaults to 0.9
(= torch's 0.1 update fraction).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


class SharedMLP(nn.Module):
    """Stack of [Dense -> BatchNorm -> activation] applied per point.

    Attributes:
        features: output width of each layer.
        act: activation (default ReLU, like the reference MLPs).
        use_bias: Dense bias; the reference's DGCNN convs are bias-free
            (dgcnn.py:68), its PointNet++ convs have bias.
        use_norm: include BatchNorm (true for every reference MLP).
        dtype: compute dtype (bf16 for TPU fast path); params stay f32.
    """

    features: Sequence[int]
    act: Callable = nn.relu
    use_bias: bool = True
    use_norm: bool = True
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        for width in self.features:
            x = nn.Dense(width, use_bias=self.use_bias, dtype=self.dtype)(x)
            if self.use_norm:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                    dtype=self.dtype,
                )(x)
            x = self.act(x)
        return x


def leaky_relu_02(x):
    """LeakyReLU(0.2) — the DGCNN activation (reference dgcnn.py:70)."""
    return nn.leaky_relu(x, negative_slope=0.2)
