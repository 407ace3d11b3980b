import jax
import jax.numpy as jnp
import numpy as np

from pointseg.train.loss import (
    length_mask,
    masked_onehot_cross_entropy,
    masked_cross_entropy_int,
)


def _np_reference_loss(logits, onehot, lengths):
    """Straight numpy transcription of the reference semantics
    (Training/train_model.py:15-57)."""
    B, L, C = logits.shape
    x = logits - logits.max(-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    token = -(onehot * logp).sum(-1)
    mask = np.arange(L)[None, :] < lengths[:, None]
    total = mask.sum()
    if total == 0:
        return 0.0
    return float((token * mask).sum() / total)


def test_length_mask():
    m = length_mask(jnp.array([0, 2, 5]), 4)
    expected = np.array(
        [[False] * 4, [True, True, False, False], [True] * 4]
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_matches_reference_semantics(rng):
    B, L, C = 3, 17, 14
    logits = rng.normal(size=(B, L, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, L))
    onehot = np.eye(C, dtype=np.float32)[labels]
    lengths = np.array([17, 5, 0])
    # padded rows are all-zero labels, like collate_blocks
    for b in range(B):
        onehot[b, lengths[b]:] = 0.0

    got = masked_onehot_cross_entropy(jnp.array(logits), jnp.array(onehot), jnp.array(lengths))
    want = _np_reference_loss(logits, onehot, lengths)
    assert abs(float(got) - want) < 1e-5


def test_all_padding_returns_zero():
    logits = jnp.ones((2, 4, 3))
    onehot = jnp.zeros((2, 4, 3))
    lengths = jnp.zeros((2,), dtype=jnp.int32)
    assert float(masked_onehot_cross_entropy(logits, onehot, lengths)) == 0.0


def test_int_label_variant_matches_onehot(rng):
    B, L, C = 2, 9, 5
    logits = rng.normal(size=(B, L, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(B, L))
    onehot = np.eye(C, dtype=np.float32)[labels]
    lengths = np.array([9, 3])
    a = masked_onehot_cross_entropy(jnp.array(logits), jnp.array(onehot), jnp.array(lengths))
    b = masked_cross_entropy_int(jnp.array(logits), jnp.array(labels), jnp.array(lengths))
    assert abs(float(a) - float(b)) < 1e-6


def test_jittable_and_differentiable(rng):
    B, L, C = 2, 8, 4
    logits = jnp.array(rng.normal(size=(B, L, C)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.zeros((B, L), jnp.int32), C)
    lengths = jnp.array([8, 4])
    g = jax.jit(jax.grad(masked_onehot_cross_entropy))(logits, labels, lengths)
    assert g.shape == logits.shape
    # grad of masked positions must be zero
    assert float(jnp.abs(g[1, 4:]).sum()) == 0.0
