import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.models import PointNetSeg
from pointseg.parallel import create_mesh, shard_batch, shard_state
from pointseg.train.state import create_train_state, train_step

C = 14


@pytest.fixture(scope="module", autouse=True)
def _no_persistent_cache():
    """Multi-device programs must neither load from nor write to the
    persistent compilation cache: EXECUTING an AOT-cache-loaded XLA:CPU
    collective executable poisons the process's collective runtime for
    every LATER fresh-compiled collective program — worker threads then
    arrive at different collectives of the same run and rendezvous.cc
    aborts the process after its 40 s termination timeout (jax 0.9.0;
    measured: this module is green with a cold cache and SIGABRTs at
    the dryrun with a warm one, while the loaded executables themselves
    run correctly). CLAUDE.md "XLA:CPU persistent-cache reload"."""
    was = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", was)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return create_mesh(jax.devices()[:8])


def _batch(rng, B, N):
    points = rng.normal(size=(B, N, 9)).astype(np.float32)
    labels = np.eye(C, dtype=np.uint8)[rng.integers(0, C, size=(B, N))]
    lengths = np.full((B,), N, np.int32)
    return points, labels, lengths


def test_dp_train_step_runs_on_mesh(mesh, rng):
    model = PointNetSeg(num_classes=C)
    state = create_train_state(model, jnp.zeros((8, 64, 9)))
    state = shard_state(mesh, state)
    batch = shard_batch(mesh, _batch(rng, 8, 64))
    new_state, m = train_step(state, *batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    # batch stays sharded over the data axis
    assert len(batch[0].sharding.device_set) == 8


def test_dp_matches_single_device(rng):
    """The same step on a 1-device mesh and an 8-device mesh must agree:
    GSPMD parallelization is semantics-preserving."""
    model = PointNetSeg(num_classes=C)
    batch_np = _batch(rng, 8, 64)

    def run(n_dev):
        mesh = create_mesh(jax.devices()[:n_dev])
        state = create_train_state(model, jnp.zeros((8, 64, 9)), seed=0)
        state = shard_state(mesh, state)
        batch = shard_batch(mesh, batch_np)
        state, m = train_step(state, *batch, jax.random.key(0))
        return float(m["loss"]), jax.tree.leaves(state.params)[0]

    loss1, p1 = run(1)
    loss8, p8 = run(8)
    assert abs(loss1 - loss8) < 1e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)


def test_point_axis_sharding_forward(mesh, rng):
    """Spatial sharding of N for whole-room eval compiles and matches
    the replicated result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = PointNetSeg(num_classes=C)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 512, 9)))
    pts = rng.normal(size=(1, 512, 9)).astype(np.float32)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = fwd(variables, jnp.asarray(pts))
    sharded = jax.device_put(pts, NamedSharding(mesh, P(None, "data")))
    out = fwd(variables, sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_tp_matches_replicated(rng):
    """DPxTP (wide weights column-sharded over the model axis) must give
    the same result as fully replicated — GSPMD TP is semantics-
    preserving."""
    from pointseg.parallel import create_mesh, shard_batch, shard_state, shard_state_tp

    model = PointNetSeg(num_classes=C)
    batch_np = _batch(rng, 8, 64)

    def run(tp):
        mesh = create_mesh(
            jax.devices()[:8], axes=("data", "model"), shape=(8 // tp, tp)
        )
        state = create_train_state(model, jnp.zeros((8, 64, 9)), seed=0)
        state = shard_state_tp(mesh, state) if tp > 1 else shard_state(mesh, state)
        batch = shard_batch(mesh, batch_np)
        state, m = train_step(state, *batch, jax.random.key(0))
        return float(m["loss"]), np.asarray(jax.tree.leaves(state.params)[0])

    loss_rep, p_rep = run(1)
    loss_tp, p_tp = run(2)
    assert abs(loss_rep - loss_tp) < 1e-4
    np.testing.assert_allclose(p_rep, p_tp, atol=1e-5)


def test_tensor_parallel_sharding_rules():
    from jax.sharding import PartitionSpec as P

    from pointseg.parallel import create_mesh, tensor_parallel_sharding

    mesh = create_mesh(jax.devices()[:8], axes=("data", "model"), shape=(4, 2))
    wide = jnp.zeros((64, 256))
    narrow = jnp.zeros((64, 14))  # not divisible-friendly / too small
    vec = jnp.zeros((256,))
    assert tensor_parallel_sharding(mesh, wide).spec == P(None, "model")
    assert tensor_parallel_sharding(mesh, narrow).spec == P()
    assert tensor_parallel_sharding(mesh, vec).spec == P()


@pytest.mark.parametrize("model_name", ["PointNet++", "PointNeXt", "DeepGraphCnn"])
def test_dp_matches_single_device_geometric_models(rng, model_name):
    """GSPMD must be semantics-preserving for the geometric models too
    (FPS/ball-query/kNN inside the sharded program).

    The step uses SGD, not Adam: after one Adam step from a fresh
    optimizer the update is ~lr·sign(grad), so a gradient element at
    the f32 reassociation noise floor (different GSPMD partitionings
    reassociate sums differently) flips a full ±2·lr — amplifying
    harmless rounding into test failures. With SGD the parameter
    difference is lr·(grad difference), so the tolerance measures the
    gradient agreement itself: a genuine semantic divergence (e.g. a
    selection that changes under sharding) shifts grads by O(1) and
    params by ~1e-3, far above the 2e-5 bound."""
    import optax

    from pointseg.models import create_model

    kwargs = {"k": 8, "emb_dims": 64} if model_name == "DeepGraphCnn" else {}
    model = create_model(model_name, num_classes=C, **kwargs)
    batch_np = _batch(rng, 8, 64)

    def run(n_dev):
        mesh = create_mesh(jax.devices()[:n_dev])
        state = create_train_state(
            model, jnp.zeros((8, 64, 9)), seed=0, tx=optax.sgd(1e-3)
        )
        state = shard_state(mesh, state)
        batch = shard_batch(mesh, batch_np)
        state, m = train_step(state, *batch, jax.random.key(0))
        return float(m["loss"]), jax.tree.leaves(state.params)[0]

    loss1, p1 = run(1)
    loss8, p8 = run(8)
    assert abs(loss1 - loss8) < 5e-4
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=2e-5)


def test_point_axis_sharded_eval_matches_unsharded_geometric(mesh, rng):
    """Whole-room point-axis sharding must be numerically equal to the
    unsharded forward for a model whose neighborhoods span shards
    (VERDICT.md round-1 weak#6: shape-only assertions are not enough)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointseg.models import PointNetPP

    model = PointNetPP(num_classes=C)
    pts = rng.normal(size=(1, 512, 9)).astype(np.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.key(0), jnp.asarray(pts))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = np.asarray(fwd(variables, jnp.asarray(pts)))
    sharded = jax.device_put(pts, NamedSharding(mesh, P(None, "data")))
    out = np.asarray(fwd(variables, sharded))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_window_group_sharded_room_eval_matches_unsharded(mesh, rng):
    """Whole-room streaming eval with the window-group axis sharded over
    the mesh (spatial context parallelism) must match the unsharded
    streaming result exactly — windows are independent work items."""
    from pointseg.utils.sliding_window import predict_single_scene_device

    model = PointNetSeg(num_classes=C)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 64, 9)))

    @jax.jit
    def fwd(points, lengths):
        return model.apply(variables, points, train=False)

    pts = rng.normal(size=(900, 9)).astype(np.float32)
    p1, c1 = predict_single_scene_device(fwd, pts, window_size=64,
                                         overlap=16, num_classes=C)
    p8, c8 = predict_single_scene_device(fwd, pts, window_size=64,
                                         overlap=16, num_classes=C,
                                         mesh=mesh)
    np.testing.assert_array_equal(p8, p1)
    np.testing.assert_allclose(c8, c1, atol=1e-5)
