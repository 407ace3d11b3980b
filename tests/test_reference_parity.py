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

from pointseg.runtime import host_cache_dir


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
    # than K points the semantics deliberately differ: the reference's
    # topk-over-inf admits arbitrary out-of-radius points in a torch-
    # implementation-defined order (common.py:58-61), while this
    # framework repeats the ball's nearest member (see
    # pointseg/ops/ballquery.py). So compare the genuine members as
    # sets, and assert our fillers are exact repeats of slot 0.
    d2 = ((coords[:, None, :, :] - cents[:, :, None, :]) ** 2).sum(-1)
    inside = d2 <= r * r  # (B, C, N)
    idx, in_ball = ops.ball_query(jnp.array(cents), jnp.array(coords), r, K)
    idx, in_ball = np.asarray(idx), np.asarray(in_ball)

    def torch_in_ball_rows(b, c):
        return sorted(
            tuple(np.round(want[b, c, k], 5))
            for k in range(K)
            # a row is in-ball iff its re-centered coords have norm <= r
            if (want[b, c, k, :3] ** 2).sum() <= r * r + 1e-6
        )

    for b in range(B):
        for c in range(C):
            n_in = min(int(inside[b, c].sum()), K)
            assert int(in_ball[b, c].sum()) == n_in
            w_rows = torch_in_ball_rows(b, c)
            g_rows = sorted(
                tuple(np.round(got[b, c, k], 5)) for k in range(n_in)
            )
            assert len(w_rows) == len(g_rows) == n_in
            np.testing.assert_allclose(
                np.array(w_rows), np.array(g_rows), atol=2e-5
            )
            # filler slots repeat the nearest member's index
            np.testing.assert_array_equal(
                idx[b, c, n_in:], np.full(K - n_in, idx[b, c, 0])
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


def test_pointnet_cls_transferred_weights_forward(rng):
    from models.PointNet.PointNet import PointNetCls as Ref

    from pointseg.models import PointNetCls

    torch.manual_seed(19)
    ref = Ref(k=14)
    _randomize_bn(ref, torch.Generator().manual_seed(5))
    ref.eval()

    x = rng.normal(size=(2, 128, 9)).astype(np.float32)
    logits = _import_and_run(PointNetCls(num_classes=14), "PointNetCls", ref, x)
    # the reference returns log-softmax (PointNet.py:116); ours raw logits
    got = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    with torch.no_grad():
        # cls forward feeds the encoder channels-first directly (no
        # internal transpose, unlike PointNetSeg.forward)
        want = ref(torch.tensor(np.swapaxes(x, 1, 2)))[0].numpy()
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


def test_import_torch_cli_roundtrip(rng, tmp_path):
    """`pointseg import-torch` (the user-facing migration path) must
    write a checkpoint whose restored params equal the direct
    from_torch_state_dict conversion — i.e. the CLI + msgpack roundtrip
    is lossless."""
    import subprocess

    from models.PointNet.PointNet import PointNetSeg as Ref

    from pointseg.io.checkpoint import load_config, restore_train_state
    from pointseg.models import PointNetSeg
    from pointseg.train.state import create_train_state

    torch.manual_seed(23)
    ref = Ref(part_classes=14)
    _randomize_bn(ref, torch.Generator().manual_seed(5))
    pt_path = tmp_path / "ref_pointnet.pt"
    torch.save(ref.state_dict(), pt_path)

    out_dir = tmp_path / "imported"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [
            sys.executable, "-m", "pointseg.cli", "import-torch",
            "--torch-checkpoint", str(pt_path), "--model", "PointNet",
            "--out-dir", str(out_dir), "--num-points", "128",
        ],
        capture_output=True, text=True, timeout=560, cwd=repo,
        env=dict(
            os.environ, JAX_PLATFORMS="cpu", POINTSEG_PLATFORM="cpu",
            POINTSEG_COMPILE_CACHE=host_cache_dir("/tmp/jax_cache"),
        ),
    )
    assert res.returncode == 0, res.stderr
    cfg = load_config(str(out_dir))
    assert cfg["model"] == "PointNet" and cfg["num_classes"] == 14

    model = PointNetSeg(num_classes=14)
    state = create_train_state(model, jnp.zeros((2, 128, 9)))
    state = restore_train_state(str(out_dir), state)
    want = from_torch_state_dict(
        "PointNet", ref.state_dict(),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    for got, exp in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(want["params"])
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    for got, exp in zip(
        jax.tree.leaves(state.batch_stats), jax.tree.leaves(want["batch_stats"])
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    # full migration journey: the imported checkpoint dir must be
    # directly consumable by the evaluate CLI (config-sidecar model
    # discovery, 14-class block mode) on a synthetic block dataset
    from pointseg.data.synthetic import make_block_dataset

    data_dir = tmp_path / "blocks"
    make_block_dataset(str(data_dir), areas=(1, 2, 3, 4, 5, 6),
                       rooms_per_area=1, points_per_room=2000, seed=0)
    res = subprocess.run(
        [
            sys.executable, "-m", "pointseg.cli", "evaluate",
            "--model-path", str(out_dir), "--data-path", str(data_dir),
            "--sampling", "128", "--batch-size", "2",
        ],
        capture_output=True, text=True, timeout=560, cwd=repo,
        env=dict(
            os.environ, JAX_PLATFORMS="cpu", POINTSEG_PLATFORM="cpu",
            POINTSEG_COMPILE_CACHE=host_cache_dir("/tmp/jax_cache"),
        ),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Loaded PointNet" in res.stdout
    assert "Mean IoU" in res.stdout


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


def test_pointnet_cls_param_count_matches_reference():
    from models.PointNet.PointNet import PointNetCls as RefCls

    from pointseg.models import PointNetCls

    ref_n = _torch_param_count(RefCls(k=40))
    got_n = _jax_param_count(PointNetCls(num_classes=40), jnp.zeros((2, 64, 9)))
    assert got_n == ref_n


# ------------------------------------ train-step gradient parity
#
# Forward equivalence (above) proves "same function"; this proves "same
# TRAINING step": with identical weights and an identical batch, the
# train-mode forward (batch-stat BN), the masked-CE loss, the gradient
# of every parameter, and the BN running-stat EMA update all agree
# between the torch reference and this framework. Passing means any
# end-to-end training-quality gap (tools/train_parity.py) comes from
# genuinely stochastic choices (dropout draws, FPS starts, init), not
# from a systematic optimization-dynamics divergence.
#
# Controlled nondeterminism, as in the forward tests: FPS starts pinned
# to 0 on both sides, dropout disabled (rate 0 here; both frameworks'
# scaling conventions are inverted-dropout so rate 0 is the identity),
# tiny cloud so every ball is full.
#
# Gradient mapping: the reference's fused first-layer weights over
# cat(rel, feats) split into w_rel/w_feat (torch_import.py) — a LINEAR
# slicing of the concatenated weight, so torch grads map to flax grads
# through the exact same importer transform.
#
# Tolerances are NOISE-REFERENCED, not fixed: this gradient is badly
# conditioned in f32 (ten BN layers on a deliberately tiny cloud), and
# merely re-running the SAME jax loss eagerly instead of jitted (pure
# summation reassociation) moves substantive leaves by 1-3e-2 relative.
# The torch-vs-jax error was measured at uniformly ~2.5-3.7x that
# self-noise across every substantive leaf (global cosine 0.9977), i.e.
# at the f32 floor. So each leaf asserts against 8x its own measured
# jit-vs-eager noise (plus a small absolute floor), which still catches
# any systematic divergence (wrong formula => error ~ |g|, hundreds of
# times the floor) while being robust to rounding.


def _grad_state_dict(model):
    out = {}
    for k, v in model.named_parameters():
        assert v.grad is not None, f"no grad for {k}"
        out[k] = v.grad.detach().clone()
    for k, v in model.named_buffers():  # placeholders; params-only compare
        out[k] = torch.zeros_like(v) if v.dtype.is_floating_point else v
    return out


def test_pointnetpp_train_step_gradient_parity():
    import copy

    from models.PointNetpp.PointNetpp import PointNetpp as Ref
    from Training.train_model import masked_onehot_cross_entropy as ref_ce

    import flax

    from pointseg.models import PointNetPP
    from pointseg.train.loss import masked_onehot_cross_entropy

    torch.manual_seed(23)
    ref = Ref(part_classes=14)
    _randomize_bn(ref, torch.Generator().manual_seed(5))
    sd0 = copy.deepcopy(ref.state_dict())
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    # Cloud seed is PINNED to a verified flip-free draw: near-tie 3-NN
    # selections differ between torch's direct-difference distances and
    # our Gram-trick distances at f32, and a single flipped neighbor
    # reroutes enough gradient mass through the SA path to swamp the
    # tolerance (seed 0 has one flip -> 6.5e-2 rel err at sa1). Seed 1
    # was exhaustively checked to produce ZERO differing FPS/ball-query/
    # 3-NN selections across all stages for this exact (B, N, span).
    B, N = 2, 1024
    rng = np.random.default_rng(1)
    x = _tiny_cloud(rng, B, N)
    y = np.eye(14, dtype=np.float32)[rng.integers(0, 14, (B, N))]
    lengths = np.full((B,), N, np.int64)

    with mock.patch("torch.randint", _zero_randint):
        logits_t = ref(torch.tensor(x))
    loss_t = ref_ce(logits_t, torch.tensor(y), torch.tensor(lengths))
    loss_t.backward()

    model = PointNetPP(num_classes=14, dropout=0.0)
    v0 = model.init({"params": jax.random.key(0)}, jnp.array(x), train=False)
    variables = from_torch_state_dict("PointNet++", sd0, dict(v0))

    def loss_fn(params):
        logits, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.array(x),
            train=True,
            mutable=["batch_stats"],
        )
        loss = masked_onehot_cross_entropy(logits, jnp.array(y), jnp.array(lengths))
        return loss, upd["batch_stats"]

    (loss_j, new_stats), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    # eager re-evaluation: same math, different op fusion/summation order.
    # Its distance to the jitted grads is the per-leaf f32 noise floor.
    with jax.disable_jit():
        (_, _), grads_eager = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )

    # same loss
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5, atol=1e-6)

    # same parameter gradients, to within 8x the measured reassociation
    # noise per leaf (see the tolerance note above)
    want_tree = from_torch_state_dict("PointNet++", _grad_state_dict(ref), dict(v0))
    flat_want = flax.traverse_util.flatten_dict(want_tree["params"], sep="/")
    flat_got = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads), sep="/"
    )
    flat_eager = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads_eager), sep="/"
    )
    assert flat_got.keys() == flat_want.keys()
    dots = norms_a = norms_b = 0.0
    for k, want in flat_want.items():
        got = flat_got[k]
        cross = np.linalg.norm(got - want)
        noise = np.linalg.norm(got - flat_eager[k])
        floor = 2e-3 * (1.0 + np.linalg.norm(want))
        assert cross <= max(8.0 * noise, floor), (
            f"grad mismatch at {k}: |cross|={cross:.3e} vs "
            f"8x noise {8 * noise:.3e}, floor {floor:.3e}"
        )
        dots += float(got.ravel() @ want.ravel())
        norms_a += float((got**2).sum())
        norms_b += float((want**2).sum())
    cosine = dots / np.sqrt(norms_a * norms_b)
    assert cosine > 0.995, f"global gradient cosine {cosine:.4f}"

    # same BN running-stat EMA update. Means match exactly; torch updates
    # running_var with the UNBIASED batch variance (factor n/(n-1), n as
    # small as 128 at the deepest FP stage) while flax uses the biased
    # one — compare vars at 2e-2.
    stats_t = from_torch_state_dict("PointNet++", ref.state_dict(), dict(v0))
    flat_want_s = flax.traverse_util.flatten_dict(stats_t["batch_stats"], sep="/")
    flat_got_s = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, new_stats), sep="/"
    )
    assert flat_got_s.keys() == flat_want_s.keys()
    for k, want in flat_want_s.items():
        tol = 2e-2 if k.endswith("var") else 1e-4
        np.testing.assert_allclose(
            flat_got_s[k], want, rtol=tol, atol=tol * 0.1, err_msg=k
        )


def test_dgcnn_train_step_gradient_parity():
    """Same-init DGCNN single-step grads match torch at the noise floor.

    Regression guard for the EdgeConv PARAMETERIZATION: the pre-gather
    rewrite must keep torch's (W_e, W_c) parameter coordinates. Storing
    W_c - W_e computes the same forward but different gradients
    (dL/dW_e gains a +dL/dW_c term), i.e. a different Adam trajectory —
    measured as a -0.07 mIoU DGCNN training gap before the fix (see
    pointseg/nn/blocks.py::EdgeConv docstring). Reference semantics:
    /root/reference/models/dgcnn/dgcnn.py:60-77,165-257.
    """
    import copy

    from models.dgcnn.dgcnn import DGCNNWithColor as Ref
    from Training.train_model import masked_onehot_cross_entropy as ref_ce

    import flax

    from pointseg.models import DGCNNWithColor
    from pointseg.train.loss import masked_onehot_cross_entropy

    torch.manual_seed(29)
    ref = Ref(num_classes=14, k=8, emb_dims=128)
    sd0 = copy.deepcopy(ref.state_dict())
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    B, N = 4, 256
    rng = np.random.default_rng(3)
    x = np.zeros((B, N, 9), np.float32)
    x[..., :3] = rng.normal(size=(B, N, 3))
    x[..., 3:] = rng.random((B, N, 6))
    y = np.eye(14, dtype=np.float32)[rng.integers(0, 14, (B, N))]
    lengths = np.full((B,), N, np.int64)

    logits_t = ref(torch.tensor(np.swapaxes(x[..., :6], 1, 2)))[0]
    loss_t = ref_ce(logits_t, torch.tensor(y), torch.tensor(lengths))
    loss_t.backward()

    model = DGCNNWithColor(num_classes=14, k=8, emb_dims=128, dropout=0.0)
    v0 = model.init({"params": jax.random.key(0)}, jnp.array(x), train=False)
    variables = from_torch_state_dict("DeepGraphCnn", sd0, dict(v0))

    def loss_fn(params):
        logits, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.array(x), train=True, mutable=["batch_stats"],
        )
        loss = masked_onehot_cross_entropy(
            logits, jnp.array(y), jnp.array(lengths))
        return loss, upd["batch_stats"]

    (loss_j, _), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"])
    with jax.disable_jit():
        (_, _), grads_eager = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=1e-5, atol=1e-6)

    want_tree = from_torch_state_dict(
        "DeepGraphCnn", _grad_state_dict(ref), dict(v0))
    flat_want = flax.traverse_util.flatten_dict(want_tree["params"], sep="/")
    flat_got = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads), sep="/")
    flat_eager = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads_eager), sep="/")
    assert flat_got.keys() == flat_want.keys()
    dots = na = nb = 0.0
    for k, want in flat_want.items():
        got = flat_got[k]
        cross = np.linalg.norm(got - want)
        # noise-referenced tolerance (same rationale as the PointNet++
        # test): the jit-vs-eager distance is the f32 reassociation
        # floor; the fused EdgeConv's analytic batch stats sit ~1e-3
        # relative from the materialized form, so allow 8x that floor
        # plus a small absolute term for near-zero leaves.
        noise = np.linalg.norm(got - flat_eager[k])
        floor = 2e-2 * (1.0 + np.linalg.norm(want))
        assert cross <= max(8.0 * noise, floor), (
            f"grad mismatch at {k}: |cross|={cross:.3e} vs "
            f"8x noise {8 * noise:.3e}, floor {floor:.3e}"
        )
        dots += float(got.ravel() @ want.ravel())
        na += float((got ** 2).sum())
        nb += float((want ** 2).sum())
    cosine = dots / np.sqrt(na * nb)
    assert cosine > 0.999, f"global gradient cosine {cosine:.6f}"
