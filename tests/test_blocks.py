"""Block-level unit tests, incl. algebraic-equivalence proofs for the
pre-gather matmul rewrites (GroupedFirstLayer, EdgeConv)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg import ops
from pointseg.nn.blocks import (
    EdgeConv,
    FeaturePropagation,
    GroupedFirstLayer,
    InvResMLP,
    SetAbstraction,
    SetAbstractionMSG,
    TNet,
)
from pointseg.nn.mlp import SharedMLP, leaky_relu_02


@pytest.fixture()
def data(rng):
    coords = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.5)
    feats = jnp.asarray(rng.normal(size=(2, 64, 6)).astype(np.float32))
    return coords, feats


def test_grouped_first_layer_equals_unfused_reference_form(data, rng):
    """GroupedFirstLayer == Dense(3+D -> h) on group() output, when the
    split kernels are assembled into the concat kernel."""
    coords, feats = data
    h = 16
    r, K = 0.5, 8
    layer = GroupedFirstLayer(h, r, K)
    v = layer.init({"params": jax.random.key(0)}, coords[:, :16], coords, feats)
    got = layer.apply(v, coords[:, :16], coords, feats, train=False)

    # assemble the unfused Dense(3+D -> h): kernel = [W_rel; W_feat]
    w_rel = v["params"]["w_rel"]["kernel"]  # (3, h)
    b_rel = v["params"]["w_rel"]["bias"]  # (h,)
    w_feat = v["params"]["w_feat"]["kernel"]  # (D, h)
    grouped = ops.group(coords[:, :16], coords, feats, r, K)  # (B, C, K, 3+D)
    pre = grouped[..., :3] @ w_rel + grouped[..., 3:] @ w_feat + b_rel
    # same BN (init stats), same relu
    mean = pre.mean(axis=(0, 1, 2))
    var = pre.var(axis=(0, 1, 2))
    scale = v["params"]["bn"]["scale"]
    bias = v["params"]["bn"]["bias"]
    want = nn.relu((pre - mean) / jnp.sqrt(var + 1e-5) * scale + bias)
    # eval mode uses running stats (0 mean, 1 var) in `got`; recompute
    # got with train=True for batch stats to compare apples to apples
    got_train, _ = layer.apply(
        v, coords[:, :16], coords, feats, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got_train), np.asarray(want), atol=2e-5)
    assert got.shape == (2, 16, 8, h)


def test_edgeconv_equals_unfused_reference_form(data):
    """EdgeConv's split Dense == Dense(2F -> out) on cat(x_j - x_i, x_i)."""
    coords, feats = data
    out_ch, k = 12, 5
    layer = EdgeConv(out_ch, k)
    v = layer.init({"params": jax.random.key(0)}, feats)

    w_e = v["params"]["w_edge"]["kernel"]  # (F, out) — torch W_e
    w_c = v["params"]["w_center"]["kernel"]  # (F, out) — torch W_c
    # reference form: W = [W_edge ; W_center] on cat(xj - xi, xi)
    edges = ops.graph_feature(feats, k)  # (B, N, k, 2F)
    F = feats.shape[-1]
    pre = edges[..., :F] @ w_e + edges[..., F:] @ w_c

    mean = pre.mean(axis=(0, 1, 2))
    var = pre.var(axis=(0, 1, 2))
    scale = v["params"]["bn"]["scale"]
    bias = v["params"]["bn"]["bias"]
    want = jnp.max(
        leaky_relu_02((pre - mean) / jnp.sqrt(var + 1e-5) * scale + bias), axis=2
    )
    got, _ = layer.apply(v, feats, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_set_abstraction_shapes(data):
    coords, feats = data
    sa = SetAbstraction(16, 0.5, [8, 12], K=4)
    v = sa.init({"params": jax.random.key(0)}, coords, feats)
    c, f = sa.apply(v, coords, feats)
    assert c.shape == (2, 16, 3) and f.shape == (2, 16, 12)


def test_set_abstraction_msg_concat(data):
    coords, feats = data
    sa = SetAbstractionMSG(16, (0.25, 0.5), (4, 8), ([8], [8, 12]))
    v = sa.init({"params": jax.random.key(0)}, coords, feats)
    c, f = sa.apply(v, coords, feats)
    assert f.shape == (2, 16, 8 + 12)


def test_invresmlp_residual(data):
    coords, feats = data
    feats16 = feats[..., :3]
    block = InvResMLP(0.5, 3, K=4)
    v = block.init({"params": jax.random.key(0)}, coords, feats16)
    c, f = block.apply(v, coords, feats16)
    assert f.shape == feats16.shape
    np.testing.assert_array_equal(np.asarray(c), np.asarray(coords))


def test_feature_propagation_with_and_without_skip(data):
    coords, feats = data
    fp = FeaturePropagation([8])
    src_c = coords[:, :16]
    src_f = feats[:, :16]
    v = fp.init({"params": jax.random.key(0)}, coords, src_c, feats, src_f)
    out = fp.apply(v, coords, src_c, feats, src_f)
    assert out.shape == (2, 64, 8)
    fp2 = FeaturePropagation([8])
    v2 = fp2.init({"params": jax.random.key(0)}, coords, src_c, None, src_f)
    out2 = fp2.apply(v2, coords, src_c, None, src_f)
    assert out2.shape == (2, 64, 8)


def test_tnet_starts_near_identity(data):
    coords, feats = data
    t = TNet(k=6)
    v = t.init({"params": jax.random.key(0)}, feats)
    m = np.asarray(t.apply(v, feats))
    assert m.shape == (2, 6, 6)
    # identity-added output: diagonal dominates at init
    diag = np.abs(np.diagonal(m, axis1=1, axis2=2)).mean()
    off = np.abs(m - np.eye(6)).mean()
    assert diag > off


def _ec_apply(layer, v, feats, train):
    if train:
        return layer.apply(v, feats, train=True, mutable=["batch_stats"])
    return layer.apply(v, feats, train=False), v["batch_stats"]


def test_edgeconv_fused_equals_unfused_train_and_eval(data):
    """The fused EdgeConv (no (B,N,k,C) materialization) must equal the
    straightforward gather->BN->leaky->max form: outputs AND updated
    running statistics, in both modes."""
    coords, feats = data
    out_ch, k = 12, 5
    fused = EdgeConv(out_ch, k, fused=True)
    plain = EdgeConv(out_ch, k, fused=False)
    v = fused.init({"params": jax.random.key(0)}, feats)
    # same variable layout by construction (checkpoint compatibility)
    vp = plain.init({"params": jax.random.key(0)}, feats)
    assert jax.tree.structure(v) == jax.tree.structure(vp)

    # nudge running stats off their defaults so eval mode is non-trivial
    v = jax.tree.map(lambda a: a, v)
    v["batch_stats"]["bn"]["mean"] = 0.1 * jnp.arange(out_ch, dtype=jnp.float32)
    v["batch_stats"]["bn"]["var"] = 1.0 + 0.05 * jnp.arange(out_ch, dtype=jnp.float32)
    v["params"]["bn"]["scale"] = jnp.asarray(
        np.linspace(-1.2, 1.3, out_ch), jnp.float32)  # negative slopes too

    for train in (True, False):
        got, stats_f = _ec_apply(EdgeConv(out_ch, k, fused=True), v, feats, train)
        want, stats_p = _ec_apply(EdgeConv(out_ch, k, fused=False), v, feats, train)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=3e-5,
            err_msg=f"train={train}")
        bn_f = stats_f.get("batch_stats", stats_f)["bn"]
        bn_p = stats_p.get("batch_stats", stats_p)["bn"]
        for key_ in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(bn_f[key_]), np.asarray(bn_p[key_]),
                atol=3e-6, err_msg=f"train={train} stat={key_}")


def test_edgeconv_fused_gradients_match_unfused(data):
    coords, feats = data
    out_ch, k = 8, 4
    v = EdgeConv(out_ch, k, fused=True).init({"params": jax.random.key(1)}, feats)

    def loss(params, fused):
        layer = EdgeConv(out_ch, k, fused=fused)
        out, _ = layer.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            feats, train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    gf = jax.grad(loss)(v["params"], True)
    gp = jax.grad(loss)(v["params"], False)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
