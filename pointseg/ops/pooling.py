"""Region pooling over grouped neighborhoods.

Rebuild of `reduce` in the reference (models/utils/common.py:74-91),
with the reference's 'avg' bug fixed: there, `torch.mean(x, dim=2)[0]`
selects batch element 0 instead of taking the values (SURVEY.md §2 L3);
here 'avg' is a real mean. Masked variants are provided so padded
neighbors can be excluded (the reference has no masking).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reduce(x: jax.Array, kind: str = "max", axis: int = 2) -> jax.Array:
    """Pools each region to a single point. x: (B, C, K, D) -> (B, C, D)."""
    if kind == "max":
        return jnp.max(x, axis=axis)
    if kind == "avg":
        return jnp.mean(x, axis=axis)
    raise ValueError(f"'{kind}' pooling not supported; use 'max' or 'avg'.")


def masked_reduce(
    x: jax.Array, mask: jax.Array, kind: str = "max", axis: int = 2
) -> jax.Array:
    """Pools with an explicit validity mask over the pooled axis.

    Args:
        x: (..., K, D) values.
        mask: broadcastable bool, True = valid, over the same K axis.
        kind: 'max' or 'avg'.
    """
    mask = jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask
    any_valid = jnp.any(mask, axis=axis)
    if kind == "max":
        neg = jnp.finfo(x.dtype).min
        pooled = jnp.max(jnp.where(mask, x, neg), axis=axis)
        # A fully-masked region (e.g. a zero-length padded sample) pools
        # to 0, not finfo.min — otherwise the sentinel poisons BatchNorm
        # batch statistics downstream (NaNs through the whole batch).
        return jnp.where(any_valid, pooled, 0.0).astype(x.dtype)
    if kind == "avg":
        total = jnp.sum(jnp.where(mask, x, 0), axis=axis)
        count = jnp.maximum(jnp.sum(mask, axis=axis), 1)
        return total / count.astype(x.dtype)
    raise ValueError(f"'{kind}' pooling not supported; use 'max' or 'avg'.")
