"""AOT serving export (pointseg/io/export_aot.py, `pointseg export`).

Contract: the StableHLO artifact reproduces the eval-mode forward
bit-for-bit through serialize -> bytes -> deserialize, takes weights as
runtime arguments (not baked constants), and rejects wrong shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.io.export_aot import export_forward, load_forward
from pointseg.models import PointNetSeg

C = 4


def _model_and_vars(b=2, n=64, seed=0):
    model = PointNetSeg(num_classes=C)
    example = jnp.zeros((b, n, 9), jnp.float32)
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.key(seed), example)
    return model, dict(variables), example


def test_export_roundtrip_matches_direct_forward(tmp_path):
    model, variables, example = _model_and_vars()
    pts = jnp.asarray(
        np.random.default_rng(0).normal(size=example.shape).astype(np.float32)
    )

    blob = export_forward(model, variables, example)
    path = tmp_path / "pointnet.stablehlo"
    path.write_bytes(blob)

    fwd = load_forward(path.read_bytes())
    got = np.asarray(fwd(variables, pts))
    want = np.asarray(model.apply(variables, pts, train=False))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (2, 64, C)


def test_export_weights_are_runtime_arguments(tmp_path):
    """Different weights through the SAME artifact give different
    logits — proves params aren't baked into the module."""
    model, v0, example = _model_and_vars(seed=0)
    _, v1, _ = _model_and_vars(seed=1)
    pts = jnp.asarray(
        np.random.default_rng(1).normal(size=example.shape).astype(np.float32)
    )
    fwd = load_forward(export_forward(model, v0, example))
    a = np.asarray(fwd(v0, pts))
    b = np.asarray(fwd(v1, pts))
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(
        b, np.asarray(model.apply(v1, pts, train=False)))


def test_export_rejects_wrong_shape():
    model, variables, example = _model_and_vars(b=2, n=64)
    fwd = load_forward(export_forward(model, variables, example))
    bad = jnp.zeros((2, 128, 9), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(fwd(variables, bad))
