import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.data import synthetic
from pointseg.data.datasets import create_block_dataloaders
from pointseg.io.checkpoint import (
    latest_checkpoint,
    load_config,
    restore_train_state,
    save_checkpoint,
)
from pointseg.models import PointNetSeg
from pointseg.train.logging import MetricsLogger, save_records
from pointseg.train.loop import evaluate, train_model
from pointseg.train.state import create_train_state, eval_step, train_step

C = 14


@pytest.fixture(scope="module")
def block_dir(tmp_path_factory):
    return synthetic.make_block_dataset(
        str(tmp_path_factory.mktemp("blocks")),
        rooms_per_area=1,
        points_per_room=4000,
        seed=3,
    )


@pytest.fixture(scope="module")
def _small_state_template():
    model = PointNetSeg(num_classes=C)
    example = jnp.zeros((2, 128, 9))
    return create_train_state(model, example, learning_rate=1e-3)


@pytest.fixture
def small_state(_small_state_template):
    # train_step donates its state argument; hand each test a fresh copy
    s = _small_state_template
    return s.replace(
        params=jax.tree.map(jnp.copy, s.params),
        batch_stats=jax.tree.map(jnp.copy, s.batch_stats),
        opt_state=jax.tree.map(jnp.copy, s.opt_state),
        step=jnp.copy(s.step),
    )


def test_train_step_updates_params_and_reduces_loss(small_state):
    rng = np.random.default_rng(0)
    points = jnp.array(rng.normal(size=(2, 128, 9)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.zeros((2, 128), jnp.int32), C)
    lengths = jnp.array([128, 64])

    state = small_state
    first_loss = None
    for i in range(15):
        state, m = train_step(state, points, labels, lengths, jax.random.key(1))
        if first_loss is None:
            first_loss = float(m["loss"])
    assert float(m["loss"]) < first_loss  # constant labels: must fit fast
    assert int(state.step) == 15
    assert 0.0 <= float(m["accuracy"]) <= 1.0


def test_train_step_finite_with_zero_length_row(small_state):
    """Regression: a padded zero-length sample (partial final batch) must
    not poison BatchNorm stats via the masked global max-pool."""
    rng = np.random.default_rng(5)
    points = jnp.array(rng.normal(size=(2, 128, 9)).astype(np.float32))
    labels = jnp.zeros((2, 128, C))
    labels = labels.at[0, :, 0].set(1.0)
    lengths = jnp.array([128, 0])  # second row is pure padding
    state, m = train_step(small_state, points, labels, lengths, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())


def test_eval_step_streaming_totals(small_state):
    rng = np.random.default_rng(1)
    points = jnp.array(rng.normal(size=(2, 128, 9)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.zeros((2, 128), jnp.int32), C)
    lengths = jnp.array([100, 28])
    out = eval_step(small_state, points, labels, lengths)
    assert int(out["total"]) == 128
    assert out["confusion"].shape == (C, C)
    assert int(out["confusion"].sum()) == 128


def test_end_to_end_training_learns(block_dir, tmp_path):
    """Smoke: PointNet on synthetic blocks for 2 epochs must beat chance
    (labels correlate with height by construction)."""
    train_loader, test_loader = create_block_dataloaders(
        block_dir, test_areas={6}, train_batch_size=4, test_batch_size=4,
        train_sampling=512, test_pad_to=1024,
    )
    model = PointNetSeg(num_classes=C)
    state = create_train_state(model, jnp.zeros((4, 512, 9)), learning_rate=1e-3)
    logger = MetricsLogger(str(tmp_path / "runs"), use_tensorboard=False)
    state, records = train_model(
        state, train_loader, test_loader, num_epochs=2, log_interval=5,
        logger=logger, ckpt_dir=str(tmp_path / "ckpt"),
        config={"model": "PointNet"}, verbose=False,
    )
    logger.close()
    assert len(records["train_loss"]) == 2
    assert records["train_loss"][1] < records["train_loss"][0]
    ev = evaluate(state, test_loader, num_classes=C)
    assert ev["accuracy"] > 1.5 / C  # decidedly above chance
    # logging artifacts exist
    assert os.path.exists(tmp_path / "runs" / "metrics.csv")
    assert os.path.exists(tmp_path / "runs" / "metrics.jsonl")
    # checkpoints written each epoch
    assert latest_checkpoint(str(tmp_path / "ckpt")) is not None
    assert load_config(str(tmp_path / "ckpt"))["model"] == "PointNet"


def test_checkpoint_roundtrip_and_resume(small_state, tmp_path):
    rng = np.random.default_rng(0)
    points = jnp.array(rng.normal(size=(2, 128, 9)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.zeros((2, 128), jnp.int32), C)
    lengths = jnp.array([128, 128])

    state = small_state
    for _ in range(3):
        state, _ = train_step(state, points, labels, lengths, jax.random.key(0))
    path = save_checkpoint(str(tmp_path), state, config={"lr": 1e-3})
    assert os.path.exists(path)

    model = PointNetSeg(num_classes=C)
    fresh = create_train_state(model, jnp.zeros((2, 128, 9)), seed=99)
    restored = restore_train_state(str(tmp_path), fresh)
    assert int(restored.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        restored.params,
        state.params,
    )
    # restored state continues training identically
    a, _ = train_step(restored, points, labels, lengths, jax.random.key(0))
    b, _ = train_step(state, points, labels, lengths, jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(a.params)[0]),
        np.asarray(jax.tree.leaves(b.params)[0]),
    )


def test_checkpoint_pruning(small_state, tmp_path):
    state = small_state
    for s in range(7):
        save_checkpoint(str(tmp_path), state.replace(step=jnp.int32(s)), keep=3)
    ckpts = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert len(ckpts) == 3
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_6.msgpack")


def test_save_records(tmp_path):
    p = save_records(str(tmp_path), "run1", {"train_loss": [1.0, 0.5]})
    assert p.endswith(".json") and os.path.exists(p)
    p = save_records(str(tmp_path), "run1", {"train_loss": [1.0]}, as_pickle=True)
    assert p.endswith(".pkl") and os.path.exists(p)


def test_make_optimizer_variants():
    from pointseg.train.state import make_optimizer

    import optax

    for kwargs in [
        {},
        {"schedule": "cosine", "total_steps": 100},
        {"schedule": "warmup_cosine", "total_steps": 100, "warmup_steps": 10},
        {"grad_clip": 1.0},
    ]:
        tx = make_optimizer(1e-3, **kwargs)
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, opt_state, params)
        assert jnp.isfinite(updates["w"]).all()
    with pytest.raises(ValueError, match="unknown schedule"):
        make_optimizer(1e-3, schedule="nope")


def test_confusion_dir_renders_per_epoch(block_dir, tmp_path):
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        pytest.skip("matplotlib not installed")
    train_loader, test_loader = create_block_dataloaders(
        block_dir, test_areas={6}, train_batch_size=4, test_batch_size=4,
        train_sampling=128, test_pad_to=1024,
    )
    model = PointNetSeg(num_classes=C)
    state = create_train_state(model, jnp.zeros((4, 128, 9)))
    state, _ = train_model(
        state, train_loader, test_loader, num_epochs=1, verbose=False,
        confusion_dir=str(tmp_path / "conf"),
    )
    assert (tmp_path / "conf" / "confusion_epoch_1.png").exists()


def test_bf16_train_step_matches_f32_loss():
    """--bf16 (bf16-resident activations, f32 params) must train the
    same function to activation precision: one step from identical
    inits lands within bf16 tolerance of the f32 loss. This is the
    path behind the measured 31% DGCNN step win (BENCHMARKS.md)."""
    from pointseg.models import create_model

    rng = np.random.default_rng(0)
    B, N = 2, 256
    pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    lab = jnp.asarray(np.eye(C, dtype=np.uint8)[rng.integers(0, C, (B, N))])
    ln = jnp.full((B,), N, jnp.int32)
    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        model = create_model("DeepGraphCnn", num_classes=C, k=8,
                             emb_dims=64, dtype=dtype)
        state = create_train_state(model, pts, 1e-3)
        state, m = train_step(state, pts, lab, ln, jax.random.key(0))
        losses[dtype.__name__] = float(m["loss"])
        assert np.isfinite(losses[dtype.__name__])
    assert losses["bfloat16"] == pytest.approx(losses["float32"], rel=2e-2)


def test_bn_batch_eval_ignores_running_stats():
    """--bn-stats batch (test-time BN adaptation) must (a) be invariant
    to the stored running averages, (b) be deterministic (dropout is
    forced off via the rate-0 clone), while (c) running-stats eval DOES
    depend on the stored averages. Guards the mitigation for the
    documented eval-mode BN collapse under density shift (CLAUDE.md)."""
    from pointseg.models import create_model
    from pointseg.train.state import bn_batch_apply, make_eval_step

    rng = np.random.default_rng(2)
    B, N = 2, 128
    pts = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    model = create_model("DeepGraphCnn", num_classes=C, k=8, emb_dims=64)
    state = create_train_state(model, pts, 1e-3)
    v = {"params": state.params, "batch_stats": state.batch_stats}

    out1 = bn_batch_apply(model, v, pts)
    out2 = bn_batch_apply(model, v, pts)  # (b) deterministic
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # poison the running averages; batch mode must not notice
    poisoned = {
        "params": state.params,
        "batch_stats": jax.tree.map(lambda a: a + 37.0, state.batch_stats),
    }
    out3 = bn_batch_apply(model, poisoned, pts)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out3), atol=1e-5
    )  # (a)

    run1 = model.apply(v, pts, train=False)
    run3 = model.apply(poisoned, pts, train=False)
    assert not np.allclose(np.asarray(run1), np.asarray(run3))  # (c)


def test_make_eval_step_batch_mode(small_state):
    """The batch-BN eval step plugs into the streaming evaluate loop and
    produces the same metric *totals* structure; 'running' returns the
    stock jitted step. Also covers the no-dropout-attribute model path
    (PointNetSeg has no dropout field; clone is skipped)."""
    from pointseg.train.state import make_eval_step

    model = PointNetSeg(num_classes=C)
    assert make_eval_step(model) is eval_step
    step = make_eval_step(model, bn_stats="batch")

    rng = np.random.default_rng(1)
    points = jnp.array(rng.normal(size=(2, 128, 9)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.zeros((2, 128), jnp.int32), C)
    lengths = jnp.array([100, 28])
    out = step(small_state, points, labels, lengths)
    assert int(out["total"]) == 128
    assert int(out["confusion"].sum()) == 128
    assert np.isfinite(float(out["loss"]))

    loader = [(points, labels, lengths)]
    results = evaluate(small_state, loader, num_classes=C, step_fn=step)
    assert 0.0 <= results["accuracy"] <= 1.0
    with pytest.raises(ValueError):
        make_eval_step(model, bn_stats="nope")
