"""Cross-framework golden tests against the reference implementation.

These execute the actual PyTorch reference (read-only, mounted at
/root/reference) on identical inputs and compare with this framework's
results — the strongest available parity evidence short of a real
S3DIS training run. Skipped wholesale when the reference (or torch)
is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):  # pragma: no cover
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pointseg import ops  # noqa: E402
from pointseg.train import loss as L  # noqa: E402
from pointseg.train import metrics as M  # noqa: E402


# ---------------------------------------------------------------- loss

def test_masked_ce_matches_reference(rng):
    from Training.train_model import masked_onehot_cross_entropy as ref_ce

    B, N, C = 3, 50, 14
    logits = rng.normal(size=(B, N, C)).astype(np.float32)
    labels_int = rng.integers(0, C, size=(B, N))
    onehot = np.eye(C, dtype=np.float32)[labels_int]
    lengths = np.array([50, 20, 0])
    for b in range(B):
        onehot[b, lengths[b]:] = 0

    want = float(
        ref_ce(
            torch.tensor(logits), torch.tensor(onehot), torch.tensor(lengths)
        )
    )
    got = float(
        L.masked_onehot_cross_entropy(
            jnp.array(logits), jnp.array(onehot), jnp.array(lengths)
        )
    )
    assert abs(got - want) < 1e-5


# ------------------------------------------------------------- metrics

@pytest.fixture()
def metric_batch(rng):
    B, N, C = 3, 40, 14
    probs = rng.random(size=(B, N, C)).astype(np.float32)
    labels_int = rng.integers(0, C, size=(B, N))
    onehot = np.eye(C, dtype=np.uint8)[labels_int]
    lengths = np.array([40, 17, 5])
    for b in range(B):
        onehot[b, lengths[b]:] = 0
    return probs, onehot, lengths


def test_metrics_match_reference(metric_batch):
    from Training import metrics as ref_m

    probs, onehot, lengths = metric_batch
    tp, to, tl = torch.tensor(probs), torch.tensor(onehot), torch.tensor(lengths)
    jp, jo, jl = jnp.array(probs), jnp.array(onehot), jnp.array(lengths)

    assert abs(
        float(M.overall_accuracy(jp, jo, jl)) - ref_m.overall_accuracy(tp, to, tl)
    ) < 1e-6

    ref_c, ref_t = ref_m.update_accuracy(tp, to, tl)
    got_c, got_t = M.update_accuracy(jp, jo, jl)
    assert (int(got_c), int(got_t)) == (int(ref_c), int(ref_t))

    np.testing.assert_array_equal(
        np.asarray(M.confusion_matrix(jp, jo, jl)),
        ref_m.confusion_matrix(tp, to, tl).numpy(),
    )

    ref_miou, ref_ious = ref_m.intersection_over_union(tp, to, tl)
    got_miou, got_ious = M.intersection_over_union(jp, jo, jl)
    np.testing.assert_allclose(np.asarray(got_ious), ref_ious.numpy(), rtol=1e-5)
    assert abs(float(got_miou) - ref_miou) < 1e-6

    ref_i, ref_u = ref_m.update_intersection_over_union(tp, to, tl)
    got_i, got_u = M.update_intersection_over_union(jp, jo, jl)
    np.testing.assert_allclose(np.asarray(got_i), ref_i.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_u), ref_u.numpy(), atol=1e-4)


def test_legacy_accuracy_matches_reference(rng):
    from Training.train_model import accuracy_from_one_hot as ref_acc

    labels = rng.random(size=(2, 30, 5)).astype(np.float32)
    preds = rng.random(size=(2, 30, 5)).astype(np.float32)
    want = ref_acc(torch.tensor(labels), torch.tensor(preds))
    got = float(M.accuracy_from_one_hot(jnp.array(labels), jnp.array(preds)))
    assert abs(got - want) < 1e-6


# ----------------------------------------------------------------- ops

def test_fps_matches_reference_selection(rng):
    """Same start index -> identical FPS selection as common.sample."""
    from models.utils import common as ref

    B, N, C = 2, 64, 16
    coords = rng.normal(size=(B, N, 3)).astype(np.float32)

    # capture the reference's internal random start by replaying its RNG
    torch.manual_seed(123)
    start = torch.randint(0, N, (B,), dtype=torch.int).numpy()
    torch.manual_seed(123)
    ref_coords = ref.sample(torch.tensor(coords), C).numpy()

    idx = ops.farthest_point_sampling(
        jnp.array(coords), C, start_indices=jnp.array(start)
    )
    got_coords = np.take_along_axis(coords, np.asarray(idx)[..., None], axis=1)
    np.testing.assert_allclose(got_coords, ref_coords, atol=1e-6)


def test_group_matches_reference(rng):
    from models.utils import common as ref

    B, N, C, K, D, r = 2, 48, 8, 6, 4, 0.8
    coords = rng.normal(size=(B, N, 3)).astype(np.float32) * 0.5
    feats = rng.normal(size=(B, N, D)).astype(np.float32)
    cents = coords[:, :C].copy()

    want = ref.group(
        torch.tensor(cents), torch.tensor(coords), torch.tensor(feats), r, K
    ).numpy()
    got = np.asarray(
        ops.group(jnp.array(cents), jnp.array(coords), jnp.array(feats), r, K)
    )

    # In-radius selections must agree exactly. When a ball holds fewer
    # than K points, BOTH implementations fill the rest with arbitrary
    # out-of-radius points (torch: heap order of topk-over-inf,
    # reference common.py:58-61; here: ascending index) — filler
    # identity is unspecified semantics and only the COUNT must match.
    d2 = ((coords[:, None, :, :] - cents[:, :, None, :]) ** 2).sum(-1)
    inside = d2 <= r * r  # (B, C, N)

    def in_ball_rows(x, b, c):
        rows = [
            tuple(np.round(x[b, c, k], 5))
            for k in range(K)
            # a row is in-ball iff its re-centered coords have norm <= r
            if (x[b, c, k, :3] ** 2).sum() <= r * r + 1e-6
        ]
        return sorted(rows)

    for b in range(B):
        for c in range(C):
            n_in = min(int(inside[b, c].sum()), K)
            w_rows, g_rows = in_ball_rows(want, b, c), in_ball_rows(got, b, c)
            assert len(w_rows) == len(g_rows) == n_in
            np.testing.assert_allclose(
                np.array(w_rows), np.array(g_rows), atol=2e-5
            )


def test_interpolate_matches_reference(rng):
    from models.utils import common as ref

    B, N, Msrc, D = 2, 24, 10, 5
    tgt = rng.normal(size=(B, N, 3)).astype(np.float32)
    src = rng.normal(size=(B, Msrc, 3)).astype(np.float32)
    feats = rng.normal(size=(B, Msrc, D)).astype(np.float32)

    want = ref.interpolate(
        torch.tensor(feats), torch.tensor(tgt), torch.tensor(src)
    ).numpy()
    got = np.asarray(
        ops.interpolate(jnp.array(feats), jnp.array(tgt), jnp.array(src))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_matches_reference(rng):
    from models.dgcnn.dgcnn import knn as ref_knn

    B, N, F, k = 2, 32, 6, 5
    x = rng.normal(size=(B, N, F)).astype(np.float32)
    want = ref_knn(torch.tensor(x).transpose(2, 1), k).numpy()
    got = np.asarray(ops.knn_indices(jnp.array(x), k))
    for b in range(B):
        for n in range(N):
            assert set(got[b, n].tolist()) == set(want[b, n].tolist())


# ------------------------- transferred-weights forward equivalence
#
# The strongest offline accuracy-parity proof: the reference model's
# actual torch weights are imported into the flax models
# (pointseg/io/torch_import.py) and the two frameworks' forward passes
# are compared on identical inputs in eval mode. Passing means the flax
# model computes the same *function*, not just the same architecture.
#
# Controlled nondeterminism:
# - FPS start: the reference draws torch.randint per SetAbstraction
#   (common.py:22); we patch it to 0, which is also this framework's
#   deterministic eval-mode start (pointseg/ops/fps.py:70).
# - Ball-query filler identity: when a ball holds fewer than K points,
#   which out-of-radius points pad the region is unspecified in BOTH
#   implementations (heap order vs index order). The test cloud is
#   scaled so every pairwise distance is below the smallest stage
#   radius, so every ball is full and no fillers exist.

from unittest import mock  # noqa: E402

from pointseg.io.torch_import import from_torch_state_dict  # noqa: E402


def _randomize_bn(model, gen):
    """Perturb BN affine + running stats away from their (1,0,0,1)
    defaults so the stat transfer is actually exercised."""
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.weight.uniform_(0.8, 1.2, generator=gen)
                m.bias.uniform_(-0.1, 0.1, generator=gen)
                m.running_mean.uniform_(-0.05, 0.05, generator=gen)
                m.running_var.uniform_(0.9, 1.1, generator=gen)


def _tiny_cloud(rng, B, N, span=0.03):
    """(B, N, 9) blocks whose xyz all fit inside every stage radius."""
    pts = np.zeros((B, N, 9), np.float32)
    pts[..., :3] = rng.random((B, N, 3)) * span
    pts[..., 3:] = rng.random((B, N, 6))
    return pts


def _import_and_run(model, model_name, ref, x):
    variables = model.init({"params": jax.random.key(0)}, jnp.array(x), train=False)
    variables = from_torch_state_dict(model_name, ref.state_dict(), variables)
    return np.asarray(model.apply(variables, jnp.array(x), train=False))


def _zero_randint(low, high, size, **kw):
    kw.pop("device", None)
    return torch.zeros(size, **kw)


def test_pointnet_transferred_weights_forward(rng):
    from models.PointNet.PointNet import PointNetSeg as Ref

    from pointseg.models import PointNetSeg

    torch.manual_seed(7)
    ref = Ref(part_classes=14)
    _randomize_bn(ref, torch.Generator().manual_seed(1))
    ref.eval()

    x = rng.normal(size=(2, 128, 9)).astype(np.float32)
    logits = _import_and_run(PointNetSeg(num_classes=14), "PointNet", ref, x)
    # the reference returns hand-rolled softmax probabilities
    # (PointNet.py:147-150); ours returns logits — compare in prob space
    got = np.asarray(jax.nn.softmax(logits, axis=-1))
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pointnetpp_transferred_weights_forward(rng):
    from models.PointNetpp.PointNetpp import PointNetpp as Ref

    from pointseg.models import PointNetPP

    torch.manual_seed(11)
    ref = Ref(part_classes=14)
    _randomize_bn(ref, torch.Generator().manual_seed(2))
    ref.eval()

    x = _tiny_cloud(rng, 2, 1024)
    got = _import_and_run(PointNetPP(num_classes=14), "PointNet++", ref, x)
    with mock.patch("torch.randint", _zero_randint), torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_pointnext_transferred_weights_forward(rng):
    from models.PointNeXt.PointNeXt import PointNeXt as Ref

    from pointseg.models import PointNeXt

    torch.manual_seed(13)
    ref = Ref(part_classes=14)
    _randomize_bn(ref, torch.Generator().manual_seed(3))
    ref.eval()

    x = _tiny_cloud(rng, 2, 1024)
    got = _import_and_run(PointNeXt(num_classes=14), "PointNeXt", ref, x)
    with mock.patch("torch.randint", _zero_randint), torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_dgcnn_transferred_weights_forward(rng):
    from models.dgcnn.dgcnn import DGCNNWithColor as Ref

    from pointseg.models import DGCNNWithColor

    torch.manual_seed(17)
    ref = Ref(num_classes=14, k=8, emb_dims=128)
    _randomize_bn(ref, torch.Generator().manual_seed(4))
    ref.eval()

    x = rng.normal(size=(2, 256, 9)).astype(np.float32)
    got = _import_and_run(
        DGCNNWithColor(num_classes=14, k=8, emb_dims=128), "DeepGraphCnn", ref, x
    )
    with torch.no_grad():
        want = ref(torch.tensor(np.swapaxes(x[..., :6], 1, 2)))[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


# --------------------------------------------------- model param parity

def _torch_param_count(model):
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


def _jax_param_count(model, example):
    variables = model.init({"params": jax.random.key(0)}, example, train=False)
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def test_pointnetpp_param_count_matches_reference():
    from models.PointNetpp.PointNetpp import PointNetpp as RefPNPP

    from pointseg.models import PointNetPP

    ref_n = _torch_param_count(RefPNPP(part_classes=14))
    got_n = _jax_param_count(PointNetPP(num_classes=14), jnp.zeros((2, 64, 9)))
    assert got_n == ref_n


def test_pointnext_param_count_matches_reference():
    from models.PointNeXt.PointNeXt import PointNeXt as RefPNX

    from pointseg.models import PointNeXt

    ref_n = _torch_param_count(RefPNX(part_classes=14))
    got_n = _jax_param_count(PointNeXt(num_classes=14), jnp.zeros((2, 64, 9)))
    assert got_n == ref_n


def test_dgcnn_param_count_matches_reference():
    from models.dgcnn.dgcnn import DGCNNWithColor as RefDGCNN

    from pointseg.models import DGCNNWithColor

    ref_n = _torch_param_count(RefDGCNN(num_classes=14, k=8, emb_dims=128))
    got_n = _jax_param_count(
        DGCNNWithColor(num_classes=14, k=8, emb_dims=128), jnp.zeros((2, 64, 9))
    )
    assert got_n == ref_n


def test_pointnet_param_count_matches_reference():
    from models.PointNet.PointNet import PointNetSeg as RefPN

    from pointseg.models import PointNetSeg

    ref_n = _torch_param_count(RefPN(part_classes=14))
    got_n = _jax_param_count(PointNetSeg(num_classes=14), jnp.zeros((2, 64, 9)))
    assert got_n == ref_n
