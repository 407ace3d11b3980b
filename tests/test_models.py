import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.models import (
    MODEL_REGISTRY,
    PointNetPP,
    PointNetSeg,
    create_model,
)

B, N, C = 2, 256, 14


def _init_and_apply(model, x, train=False):
    rngs = {"params": jax.random.key(0)}
    variables = model.init(rngs, x, train=False)
    apply_rngs = {"dropout": jax.random.key(1), "fps": jax.random.key(2)}
    out, _ = model.apply(
        variables, x, train=train, rngs=apply_rngs if train else None,
        mutable=["batch_stats"],
    )
    return variables, out


@pytest.fixture(scope="module")
def x(request):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(B, N, 9)).astype(np.float32) * 0.5
    return jnp.array(pts)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name, x):
    model = create_model(name, num_classes=C)
    _, out = _init_and_apply(model, x)
    assert out.shape == (B, N, C)
    assert out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("name", ["PointNet", "PointNet++", "DeepGraphCnn"])
def test_train_mode_runs(name, x):
    model = create_model(name, num_classes=C)
    _, out = _init_and_apply(model, x, train=True)
    assert out.shape == (B, N, C)


def test_pointnet_cls_shapes_and_train_mode(x):
    """PointNetCls: per-cloud (B, num_classes) logits, dropout in train."""
    from pointseg.models import PointNetCls

    model = PointNetCls(num_classes=40)
    variables, out = _init_and_apply(model, x)
    assert out.shape == (B, 40)
    assert out.dtype == jnp.float32
    _, out_t = _init_and_apply(model, x, train=True)
    assert out_t.shape == (B, 40)
    # classification head is intentionally NOT in the seg registry
    assert "PointNetCls" not in MODEL_REGISTRY


def test_unknown_model_raises():
    with pytest.raises(ValueError, match="Unknown model"):
        create_model("NotAModel")


def test_pointnet_param_structure(x):
    model = PointNetSeg(num_classes=C)
    variables, _ = _init_and_apply(model, x)
    params = variables["params"]
    assert "feat" in params and "stn" in params["feat"]
    # TNet output starts at identity-ish: kernel default init, bias zero + eye
    assert params["feat"]["stn"]["Dense_0"]["kernel"].shape == (256, 81)


def test_pointnetpp_jit_forward(x):
    model = PointNetPP(num_classes=C)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, x)
    assert out.shape == (B, N, C)


def test_dgcnn_return_features(x):
    model = create_model("DGCNN", num_classes=C, emb_dims=64, k=8)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    logits, feats = model.apply(variables, x, train=False, return_features=True)
    assert logits.shape == (B, N, C)
    assert feats.shape == (B, N, 64)


def test_dgcnn_with_color_requires_six_channels():
    model = create_model("DeepGraphCnn", num_classes=C)
    bad = jnp.zeros((1, 16, 3))
    with pytest.raises(ValueError, match="xyz"):
        model.init({"params": jax.random.key(0)}, bad, train=False)


def test_mask_excludes_padding_from_pointnet_global_pool():
    """With a validity mask, padded points must not change real outputs."""
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(1, 64, 9)).astype(np.float32)
    mask = np.zeros((1, 64), bool)
    mask[0, :40] = True

    model = PointNetSeg(num_classes=C)
    v = model.init({"params": jax.random.key(0)}, jnp.array(pts), train=False)

    a = model.apply(v, jnp.array(pts), train=False, mask=jnp.array(mask))
    pts2 = pts.copy()
    pts2[0, 40:] = 100.0  # corrupt the padding
    b = model.apply(v, jnp.array(pts2), train=False, mask=jnp.array(mask))
    np.testing.assert_allclose(
        np.asarray(a[0, :40]), np.asarray(b[0, :40]), atol=1e-5
    )


def test_dropout_active_in_train_mode(x):
    model = create_model("PointNet++", num_classes=C)
    v = model.init({"params": jax.random.key(0)}, x, train=False)
    r1 = {"dropout": jax.random.key(1), "fps": jax.random.key(2)}
    r2 = {"dropout": jax.random.key(3), "fps": jax.random.key(2)}
    a, _ = model.apply(v, x, train=True, rngs=r1, mutable=["batch_stats"])
    b, _ = model.apply(v, x, train=True, rngs=r2, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_bf16_dtype_returns_f32_logits(x):
    model = create_model("PointNet", num_classes=C, dtype=jnp.bfloat16)
    _, out = _init_and_apply(model, x)
    assert out.dtype == jnp.float32  # logits always f32 for the loss
    assert bool(jnp.isfinite(out).all())


def test_dgcnn_static_graph_checkpoint_compatible(x):
    """static_graph changes no parameter: same tree either way, so
    checkpoints trained in one mode load in the other."""
    dyn = create_model("DGCNN", num_classes=C)
    sta = create_model("DGCNN", num_classes=C, static_graph=True)
    vd = dyn.init({"params": jax.random.key(0)}, x, train=False)
    vs = sta.init({"params": jax.random.key(0)}, x, train=False)
    assert jax.tree_util.tree_structure(vd) == jax.tree_util.tree_structure(vs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        vd, vs)


def test_dgcnn_static_graph_equals_dynamic_at_k_equals_n():
    """With k == N every layer's neighborhood is ALL points in both
    modes, and EdgeConv's max/sum pooling is order-invariant — so the
    static-graph forward must equal the dynamic one exactly there
    (the modes only diverge when feature-space kNN differs from the
    xyz kNN)."""
    rng = np.random.default_rng(5)
    small = jnp.asarray(rng.normal(size=(2, 32, 9)).astype(np.float32))
    dyn = create_model("DGCNN", num_classes=C, k=32)
    sta = create_model("DGCNN", num_classes=C, k=32, static_graph=True)
    v = dyn.init({"params": jax.random.key(0)}, small, train=False)
    a = dyn.apply(v, small, train=False)
    b = sta.apply(v, small, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dgcnn_static_graph_train_step(x):
    from pointseg.train.state import create_train_state, train_step

    model = create_model("DeepGraphCnn", num_classes=C, static_graph=True)
    state = create_train_state(model, x, 1e-3)
    onehot = jnp.zeros((B, N, C), jnp.uint8).at[..., 0].set(1)
    lengths = jnp.full((B,), N, jnp.int32)
    state, metrics = train_step(state, x, onehot, lengths, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_pointnext_depth_variants(x):
    """PointNeXt-B/-L (official depth schedule, BASELINE.json config #5)
    deepen the InvResMLP stacks without touching the default tree: the
    reference-exact 'PointNeXt' keeps its exact param names (checkpoint
    compatibility) and -L strictly grows the param count."""
    import jax

    def tree(name):
        m = create_model(name, num_classes=C)
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        return v["params"]

    base, big = tree("PointNeXt"), tree("PointNeXt-L")
    assert {"irmlp1", "irmlp2", "irmlp2_1", "irmlp3", "irmlp4"} <= set(base)
    assert "irmlp2_2" not in base and "irmlp1_1" not in base
    # -L: blocks (3,5,3,3) -> stage 2 has irmlp2..irmlp2_4
    assert {"irmlp2_2", "irmlp2_3", "irmlp2_4", "irmlp1_2", "irmlp4_2"} <= set(big)
    count = lambda p: sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(p))
    assert count(big) > count(base)
