"""Fused multi-step training programs (lax.scan over train steps).

`train_steps_repeated` / `train_steps_stacked`
(pointseg/train/state.py) and the sampler-fused
`DeviceEpochLoader.scan_epoch` (pointseg/data/device.py) fold K steps
into one dispatched program. Their contract is SEMANTIC EQUALITY with
the sequential per-step loop: same batch sequence, same rng streams
(train_step folds the epoch rng by state.step, which the scan carry
threads identically). These tests pin that equality on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.data.device import DeviceBlockStore, DeviceEpochLoader
from pointseg.models import PointNetSeg
from pointseg.train.loop import train_epoch
from pointseg.train.state import (
    create_train_state, train_step, train_steps_repeated,
    train_steps_stacked,
)

C = 4


def _fresh_state(seed=0):
    model = PointNetSeg(num_classes=C)
    return create_train_state(model, jnp.zeros((2, 64, 9)),
                              learning_rate=1e-3, seed=seed)


def _batch(rng, k=None, b=2, n=64):
    shape = (b, n) if k is None else (k, b, n)
    pts = rng.normal(size=(*shape, 9)).astype(np.float32)
    lab = rng.integers(0, C, size=shape)
    onehot = np.eye(C, dtype=np.uint8)[lab]
    lengths = np.full(shape[:-1], n, np.int32)
    return jnp.asarray(pts), jnp.asarray(onehot), jnp.asarray(lengths)


def _assert_tree_close(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x, np.float64), np.asarray(y, np.float64), **kw), a, b)


def test_repeated_scan_matches_sequential():
    rng = np.random.default_rng(0)
    pts, onehot, lengths = _batch(rng)
    key = jax.random.key(7)

    seq = _fresh_state()
    losses = []
    for _ in range(3):
        seq, m = train_step(seq, pts, onehot, lengths, key)
        losses.append(float(m["loss"]))

    fused = _fresh_state()
    fused, ms = train_steps_repeated(fused, pts, onehot, lengths, key,
                                     n_steps=3)
    assert int(fused.step) == int(seq.step) == 3
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=1e-5)
    _assert_tree_close(fused.params, seq.params, rtol=2e-5, atol=1e-6)
    _assert_tree_close(fused.batch_stats, seq.batch_stats,
                       rtol=2e-5, atol=1e-6)


def test_stacked_scan_matches_sequential():
    rng = np.random.default_rng(1)
    pts, onehot, lengths = _batch(rng, k=3)
    key = jax.random.key(11)

    seq = _fresh_state()
    losses = []
    for i in range(3):
        seq, m = train_step(seq, pts[i], onehot[i], lengths[i], key)
        losses.append(float(m["loss"]))

    fused = _fresh_state()
    fused, ms = train_steps_stacked(fused, pts, onehot, lengths, key)
    assert int(fused.step) == 3
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=1e-5)
    _assert_tree_close(fused.params, seq.params, rtol=2e-5, atol=1e-6)


def _toy_store(num_blocks=7, seed=0):
    rng = np.random.default_rng(seed)
    counts = rng.integers(80, 300, size=num_blocks)
    pts = rng.normal(size=(int(counts.sum()), 9)).astype(np.float32)
    labs = rng.integers(0, C, size=pts.shape[0]).astype(np.uint8)
    return DeviceBlockStore(pts, labs, counts, num_classes=C)


def test_scan_epoch_matches_sequential_device_loop():
    """scan_epoch == (DeviceEpochLoader iteration + train_step), incl.
    a remainder chunk (7 blocks / batch 2 -> 4 steps, scan_steps=3
    -> one scan of 3 + one of 1)."""
    store = _toy_store()
    key = jax.random.key(5)

    seq_loader = DeviceEpochLoader(store, batch_size=2, npoints=64, seed=9)
    seq = _fresh_state()
    losses = []
    for pts, onehot, lengths in seq_loader:
        seq, m = train_step(seq, pts, onehot, lengths, key)
        losses.append(float(m["loss"]))

    scan_loader = DeviceEpochLoader(store, batch_size=2, npoints=64, seed=9)
    fused = _fresh_state()
    fused, ms = scan_loader.scan_epoch(fused, key, scan_steps=3)
    assert int(fused.step) == len(losses) == 4
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=1e-5)
    _assert_tree_close(fused.params, seq.params, rtol=2e-5, atol=1e-6)
    # second epoch advances the loader's epoch counter and still runs
    fused, ms2 = scan_loader.scan_epoch(fused, key, scan_steps=4)
    assert np.asarray(ms2["loss"]).shape == (4,)
    assert int(fused.step) == 8


def test_train_epoch_scan_path_equals_sequential_path():
    """The train_epoch(scan_steps=K) fast path returns the same final
    params / mean loss / global step as the default path."""
    store = _toy_store(seed=3)
    key = jax.random.key(2)

    a = _fresh_state()
    a, loss_a, gs_a = train_epoch(
        a, DeviceEpochLoader(store, 2, 64, seed=4), key,
        logger=None, log_interval=10, global_step=0)

    b = _fresh_state()
    b, loss_b, gs_b = train_epoch(
        b, DeviceEpochLoader(store, 2, 64, seed=4), key,
        logger=None, log_interval=10, global_step=0, scan_steps=2)

    assert gs_a == gs_b
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-5)
    _assert_tree_close(b.params, a.params, rtol=2e-5, atol=1e-6)
