"""Gradient accumulation (`train_step_accum`, `--accum-steps`).

Contract: K micro-batches -> ONE optimizer update from the MEAN of the
K micro-batch gradients, all taken at the same pre-update params, with
BatchNorm stats threaded sequentially and per-micro-batch rng streams
fold_in(fold_in(rng, step), i). These tests pin that contract against
an explicit eager reference on CPU, and the epoch-loop wiring
(grouping, trailing short group, optimizer-step counting).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointseg.models import PointNetSeg
from pointseg.train.loop import train_epoch
from pointseg.train.loss import masked_onehot_cross_entropy
from pointseg.train.state import (
    create_train_state, train_step_accum,
)

C = 4


def _fresh_state(seed=0, sgd=False):
    """sgd=True for the manual-reference equality tests: the reference
    runs EAGER, so grads differ from the jitted scan at float-noise
    level, and Adam's first-step g/(|g|+eps) normalization amplifies
    that noise to a full +-lr on near-zero-gradient elements. SGD is
    linear in the gradient, so the comparison stays at noise scale.
    Adam coverage comes from the program-identity tests below (same
    jitted function both sides)."""
    model = PointNetSeg(num_classes=C)
    tx = optax.sgd(0.1) if sgd else None
    return create_train_state(model, jnp.zeros((2, 64, 9)),
                              learning_rate=1e-3, tx=tx, seed=seed)


def _batch(rng, k, b=2, n=64):
    pts = rng.normal(size=(k, b, n, 9)).astype(np.float32)
    lab = rng.integers(0, C, size=(k, b, n))
    onehot = np.eye(C, dtype=np.uint8)[lab]
    lengths = np.full((k, b), n, np.int32)
    return jnp.asarray(pts), jnp.asarray(onehot), jnp.asarray(lengths)


def _assert_tree_close(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x, np.float64), np.asarray(y, np.float64), **kw), a, b)


def _manual_accum(state, pts, onehot, lengths, key):
    """Unrolled-loop reference: per-micro grads at fixed params, mean,
    one optax update; BN stats threaded sequentially. JITTED — eager
    grads for these models legitimately differ from compiled ones at
    O(1) through max-pool tie routing in the TNet branch (the same
    jit-vs-eager noise CLAUDE.md's grad-parity notes measure), so the
    reference must be a compiled program too; unrolled-vs-scan then
    agrees to ~5e-7."""
    k = pts.shape[0]

    def run(params, opt_state, batch_stats, step):
        base = jax.random.fold_in(key, step)
        bs = batch_stats
        grad_sum = jax.tree.map(jnp.zeros_like, params)
        for i in range(k):
            drng, frng = jax.random.split(jax.random.fold_in(base, i))

            def loss_fn(p, bs=bs, i=i, drng=drng, frng=frng):
                logits, updates = state.apply_fn(
                    {"params": p, "batch_stats": bs}, pts[i],
                    train=True, rngs={"dropout": drng, "fps": frng},
                    mutable=["batch_stats"])
                return (masked_onehot_cross_entropy(
                    logits, onehot[i], lengths[i]), updates["batch_stats"])

            grads, bs = jax.grad(loss_fn, has_aux=True)(params)
            grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
        grads = jax.tree.map(lambda g: g / k, grad_sum)
        updates, opt_state = state.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state

    return jax.jit(run)(state.params, state.opt_state, state.batch_stats,
                        state.step)


def test_accum_matches_manual_mean_of_grads():
    rng = np.random.default_rng(0)
    pts, onehot, lengths = _batch(rng, k=3)
    key = jax.random.key(7)

    ref = _fresh_state(sgd=True)
    ref_params, ref_bs, ref_opt = _manual_accum(ref, pts, onehot, lengths, key)

    st = _fresh_state(sgd=True)
    st, metrics = train_step_accum(st, pts, onehot, lengths, key)
    assert int(st.step) == 1  # one OPTIMIZER step, not 3
    _assert_tree_close(st.params, ref_params, rtol=2e-5, atol=1e-6)
    _assert_tree_close(st.batch_stats, ref_bs, rtol=2e-5, atol=1e-6)
    _assert_tree_close(st.opt_state, ref_opt, rtol=2e-5, atol=1e-6)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_accum_k1_matches_plain_train_step():
    """K=1 accumulation must be the plain step exactly (same rng fold:
    split(fold_in(fold_in(rng, step), 0)) != split(fold_in(rng, step)),
    so equality is on the MATH contract, not bitwise rng — verify via
    the manual reference instead for K=1 too."""
    rng = np.random.default_rng(1)
    pts, onehot, lengths = _batch(rng, k=1)
    key = jax.random.key(3)

    ref = _fresh_state(seed=2, sgd=True)
    ref_params, ref_bs, _ = _manual_accum(ref, pts, onehot, lengths, key)
    st = _fresh_state(seed=2, sgd=True)
    st, _ = train_step_accum(st, pts, onehot, lengths, key)
    _assert_tree_close(st.params, ref_params, rtol=2e-5, atol=1e-6)
    _assert_tree_close(st.batch_stats, ref_bs, rtol=2e-5, atol=1e-6)


def test_train_epoch_accum_groups_and_counts_optimizer_steps():
    """5 loader batches @ accum_steps=2 -> 3 optimizer updates (2+2+1,
    trailing short group still accumulates)."""
    rng = np.random.default_rng(4)
    pts, onehot, lengths = _batch(rng, k=5)
    batches = [(np.asarray(pts[i]), np.asarray(onehot[i]),
                np.asarray(lengths[i])) for i in range(5)]
    key = jax.random.key(5)

    st = _fresh_state(seed=1)
    st, loss, gs = train_epoch(
        st, batches, key, logger=None, log_interval=10, global_step=0,
        accum_steps=2)
    assert gs == 3
    assert int(st.step) == 3
    assert np.isfinite(loss)

    # the first group must equal a direct accum step on those 2 batches
    st2 = _fresh_state(seed=1)
    st2, _ = train_step_accum(st2, pts[:2], onehot[:2], lengths[:2], key)
    # after one more accum step on batches 2:4 and one on 4:5 they agree
    st2, _ = train_step_accum(st2, pts[2:4], onehot[2:4], lengths[2:4], key)
    st2, _ = train_step_accum(st2, pts[4:5], onehot[4:5], lengths[4:5], key)
    _assert_tree_close(st.params, st2.params, rtol=2e-5, atol=1e-6)


def test_accum_scan_steps_mutually_exclusive():
    import pytest
    st = _fresh_state()
    with pytest.raises(ValueError):
        train_epoch(st, [], jax.random.key(0), logger=None, log_interval=1,
                    global_step=0, scan_steps=2, accum_steps=2)
