"""Masked one-hot cross-entropy loss.

Rebuild of `masked_onehot_cross_entropy` in the reference
(Training/train_model.py:15-57): log-softmax over classes, per-token
−Σ y·log p, positions ≥ length masked out, mean over non-padding tokens,
and 0 when the batch is all padding. Unlike the reference this is a pure
jittable function (the all-padding case is a `where`, not a Python `if`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_mask(lengths: jax.Array, n: int) -> jax.Array:
    """(B,) lengths -> (B, N) boolean mask of valid positions."""
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    return positions < lengths.astype(jnp.int32)[:, None]


def masked_onehot_cross_entropy(
    logits: jax.Array,
    targets_onehot: jax.Array,
    lengths: jax.Array,
) -> jax.Array:
    """Mean cross-entropy over non-padding points.

    Args:
        logits: (B, N, C) unnormalized scores.
        targets_onehot: (B, N, C) one-hot labels (any numeric dtype).
        lengths: (B,) number of valid points per sample.

    Returns:
        scalar loss (f32).
    """
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    token_loss = -jnp.sum(targets_onehot.astype(jnp.float32) * log_probs, axis=-1)
    mask = length_mask(lengths, logits.shape[1]).astype(jnp.float32)
    total = jnp.sum(mask)
    loss = jnp.sum(token_loss * mask)
    return jnp.where(total > 0, loss / jnp.maximum(total, 1.0), 0.0)


def masked_cross_entropy_int(
    logits: jax.Array,
    labels: jax.Array,
    lengths: jax.Array,
) -> jax.Array:
    """Integer-label variant (avoids materializing one-hot targets)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    token_loss = -jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    mask = length_mask(lengths, logits.shape[1]).astype(jnp.float32)
    total = jnp.sum(mask)
    return jnp.where(total > 0, jnp.sum(token_loss * mask) / jnp.maximum(total, 1.0), 0.0)
