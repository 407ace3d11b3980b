"""Import reference PyTorch checkpoints into pointseg's flax models.

The reference saves ``model.state_dict()`` to ``.pt`` files (e.g.
reference models/PointNeXt/PointNeXt.py:239, Training/train_model.py).
This module converts such a state dict into the matching flax variable
collection, so users migrating from the reference can keep their trained
weights. It is also the basis of the strongest offline parity proof we
have: transferred-weights forward equivalence (tests/test_reference_parity.py).

Layout conversions:
- torch 1x1 Conv1d/Conv2d weight (out, in, 1[, 1]) and Linear weight
  (out, in) -> Dense kernel (in, out).
- BatchNorm weight/bias/running_mean/running_var -> BatchNorm
  scale/bias + batch_stats mean/var (``num_batches_tracked`` dropped).

Algebraic re-parameterizations (this framework's pre-gather rewrites):
- GroupedFirstLayer (pointseg/nn/blocks.py:34-75): the reference's first
  grouped conv acts on cat(rel_coords, features) (common.py:206-209);
  its weight W (out, 3+D) splits into w_rel = W[:, :3] (+ the conv
  bias) and w_feat = W[:, 3:].
- EdgeConv (pointseg/nn/blocks.py): the reference conv acts on
  cat(x_j - x_i, x_i) (dgcnn.py:41-77); with W = [W_a | W_b] over those
  two halves, w_edge = W_a and w_center = W_b — an identity split.
  EdgeConv deliberately keeps torch's parameter coordinates (the
  combined-form w_center' = W_b - W_a had the same forward but different
  gradients; see the EdgeConv docstring).

Both rewrites are exact up to float reassociation, so a converted
checkpoint computes the same function as the torch original.
"""

from __future__ import annotations

import numpy as np

__all__ = ["from_torch_state_dict", "load_torch_checkpoint"]


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


class _Writer:
    """Accumulates flax leaves; tracks torch-key consumption for audit."""

    def __init__(self, state_dict):
        self.sd = {k: _np(v) for k, v in state_dict.items()}
        self.used = set()
        self.out = {}  # (collection, 'a/b/c') -> ndarray

    def take(self, key):
        if key not in self.sd:
            raise KeyError(f"torch state_dict has no key {key!r}")
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def put(self, collection, path, value):
        self.out[(collection, path)] = np.asarray(value, dtype=np.float32)

    # -------------------------------------------------- layer emitters

    def dense(self, tpath, fpath, bias=True):
        """torch conv/linear `tpath`.weight[.bias] -> Dense at `fpath`."""
        w = self.take(f"{tpath}.weight")
        w = w.reshape(w.shape[0], w.shape[1])  # strip 1x1 spatial dims
        self.put("params", f"{fpath}/kernel", w.T)
        if bias:
            self.put("params", f"{fpath}/bias", self.take(f"{tpath}.bias"))

    def bn(self, tpath, fpath):
        self.put("params", f"{fpath}/scale", self.take(f"{tpath}.weight"))
        self.put("params", f"{fpath}/bias", self.take(f"{tpath}.bias"))
        self.put("batch_stats", f"{fpath}/mean", self.take(f"{tpath}.running_mean"))
        self.put("batch_stats", f"{fpath}/var", self.take(f"{tpath}.running_var"))
        self.used.add(f"{tpath}.num_batches_tracked")

    def mlp(self, tpath, fpath, n, bias=True):
        """Mini/UnitPointNet (conv/batch ModuleLists) -> SharedMLP."""
        for i in range(n):
            self.dense(f"{tpath}.conv.{i}", f"{fpath}/Dense_{i}", bias=bias)
            self.bn(f"{tpath}.batch.{i}", f"{fpath}/BatchNorm_{i}")

    def seq(self, tpath, fpath, bias=False):
        """torch Sequential(Conv, BN, act) -> single-layer SharedMLP."""
        self.dense(f"{tpath}.0", f"{fpath}/Dense_0", bias=bias)
        self.bn(f"{tpath}.1", f"{fpath}/BatchNorm_0")

    def grouped_first(self, tconv, tbn, fpath):
        """Reference grouped conv over cat(rel, feats) -> GroupedFirstLayer."""
        w = self.take(f"{tconv}.weight")
        w = w.reshape(w.shape[0], w.shape[1])  # (out, 3+D)
        self.put("params", f"{fpath}/w_rel/kernel", w[:, :3].T)
        self.put("params", f"{fpath}/w_rel/bias", self.take(f"{tconv}.bias"))
        self.put("params", f"{fpath}/w_feat/kernel", w[:, 3:].T)
        self.bn(tbn, f"{fpath}/bn")

    def edgeconv(self, tpath, fpath):
        """Reference EdgeConv Sequential(Conv2d(2F->out), BN, LeakyReLU)."""
        w = self.take(f"{tpath}.conv.0.weight")
        w = w.reshape(w.shape[0], w.shape[1])  # (out, 2F)
        F = w.shape[1] // 2
        w_a, w_b = w[:, :F], w[:, F:]  # act on (x_j - x_i) and x_i
        # identity mapping: EdgeConv keeps torch's (W_e, W_c) parameter
        # coordinates (see pointseg/nn/blocks.py::EdgeConv docstring)
        self.put("params", f"{fpath}/w_edge/kernel", w_a.T)
        self.put("params", f"{fpath}/w_center/kernel", w_b.T)
        self.bn(f"{tpath}.conv.1", f"{fpath}/bn")

    def set_abstraction(self, tpath, fpath, n_mlps):
        self.grouped_first(
            f"{tpath}.point_net.conv.0", f"{tpath}.point_net.batch.0",
            f"{fpath}/point_net0",
        )
        for i in range(1, n_mlps):
            self.dense(f"{tpath}.point_net.conv.{i}", f"{fpath}/point_net/Dense_{i-1}")
            self.bn(f"{tpath}.point_net.batch.{i}", f"{fpath}/point_net/BatchNorm_{i-1}")

    def inv_res_mlp(self, tpath, fpath):
        self.grouped_first(
            f"{tpath}.neighbour_features_mlp.conv.0",
            f"{tpath}.neighbour_features_mlp.batch.0",
            f"{fpath}/neighbour_mlp",
        )
        self.mlp(f"{tpath}.point_features_mlp", f"{fpath}/point_mlp", 2)

    def feature_propagation(self, tpath, fpath, n_mlps):
        self.mlp(f"{tpath}.point_net", f"{fpath}/point_net", n_mlps)


# ------------------------------------------------------------ per-model


def _import_pointnet_encoder(w: _Writer, feature_transform: bool):
    """models/PointNet/PointNet.py:41-91 (PointNetEncoder + TNets)."""

    def tnet(t, f):
        for i in range(3):
            w.dense(f"{t}.conv{i+1}", f"{f}/SharedMLP_0/Dense_{i}")
            w.bn(f"{t}.bn{i+1}", f"{f}/SharedMLP_0/BatchNorm_{i}")
        for i in range(2):
            w.dense(f"{t}.fc{i+1}", f"{f}/SharedMLP_1/Dense_{i}")
            w.bn(f"{t}.bn{i+4}", f"{f}/SharedMLP_1/BatchNorm_{i}")
        w.dense(f"{t}.fc3", f"{f}/Dense_0")

    tnet("feat.stn", "feat/stn")
    if feature_transform:
        tnet("feat.fstn", "feat/fstn")
    w.dense("feat.conv1", "feat/mlp1/Dense_0")
    w.bn("feat.bn1", "feat/mlp1/BatchNorm_0")
    w.dense("feat.conv2", "feat/mlp2/Dense_0")
    w.bn("feat.bn2", "feat/mlp2/BatchNorm_0")
    w.dense("feat.conv3", "feat/conv3")
    w.bn("feat.bn3", "feat/bn3")


def _import_pointnet(w: _Writer, feature_transform: bool = False):
    """models/PointNet/PointNet.py:119-150 (PointNetSeg)."""
    _import_pointnet_encoder(w, feature_transform)
    for i in range(3):
        w.dense(f"conv{i+1}", f"head/Dense_{i}")
        w.bn(f"bn{i+1}", f"head/BatchNorm_{i}")
    w.dense("conv4", "conv4")


def _import_pointnet_cls(w: _Writer, feature_transform: bool = False):
    """models/PointNet/PointNet.py:93-117 (PointNetCls)."""
    _import_pointnet_encoder(w, feature_transform)
    for i in (1, 2):
        w.dense(f"fc{i}", f"fc{i}")
        w.bn(f"bn{i}", f"bn{i}")
    w.dense("fc3", "fc3")


def _import_pointnetpp(w: _Writer):
    """models/PointNetpp/PointNetpp.py:6-48."""
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        w.set_abstraction(sa, sa, 3)
    for fp, n in (("fp4", 2), ("fp3", 2), ("fp2", 2), ("fp1", 4)):
        w.feature_propagation(fp, fp, n)
    w.dense("conv", "conv")


def _import_pointnext(w: _Writer):
    """models/PointNeXt/PointNeXt.py:17-147."""
    w.mlp("mlp", "stem", 1)
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        w.set_abstraction(sa, sa, 3)
    for ir in ("irmlp1", "irmlp2", "irmlp2_1", "irmlp3", "irmlp4"):
        w.inv_res_mlp(ir, ir)
    for fp, n in (("fp4", 2), ("fp3", 2), ("fp2", 2), ("fp1", 4)):
        w.feature_propagation(fp, fp, n)
    w.dense("conv", "conv")


def _import_dgcnn(w: _Writer, with_color: bool):
    """models/dgcnn/dgcnn.py:80-257 (DGCNN / DGCNNWithColor)."""
    for c in ("conv1", "conv2", "conv3", "conv4"):
        w.edgeconv(c, c)
    if with_color:
        w.seq("color_conv", "color_conv")
    w.seq("conv5", "conv5")
    w.seq("conv6", "conv6")
    w.seq("conv7", "conv7")
    w.dense("conv8", "conv8")


_IMPORTERS = {
    "PointNet": lambda w: _import_pointnet(w, feature_transform=False),
    "PointNetCls": lambda w: _import_pointnet_cls(w, feature_transform=False),
    "PointNet++": _import_pointnetpp,
    "PointNeXt": _import_pointnext,
    "DGCNN": lambda w: _import_dgcnn(w, with_color=False),
    "DeepGraphCnn": lambda w: _import_dgcnn(w, with_color=True),
    "DGCNNWithColor": lambda w: _import_dgcnn(w, with_color=True),
}


def from_torch_state_dict(model_name: str, state_dict, variables):
    """Converts a reference torch state_dict into flax `variables`.

    Args:
        model_name: one of PointNet / PointNet++ / PointNeXt / DGCNN /
            DeepGraphCnn (the CLI model names).
        state_dict: the torch ``model.state_dict()`` mapping (tensors or
            ndarrays).
        variables: the target model's initialized variables (from
            ``model.init``) — used as the structural/shape template.

    Returns:
        New variables pytree with every params/batch_stats leaf replaced
        by the converted torch weight. Raises if any leaf is left
        unassigned, a shape mismatches, or torch keys go unconsumed.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    if model_name not in _IMPORTERS:
        raise ValueError(
            f"unknown model {model_name!r}; expected one of {sorted(_IMPORTERS)}"
        )
    w = _Writer(state_dict)
    _IMPORTERS[model_name](w)

    unused = set(w.sd) - w.used
    if unused:
        raise ValueError(f"torch keys not consumed by the import: {sorted(unused)}")

    new_vars = {}
    for collection in variables:
        flat = flatten_dict(variables[collection])
        for path, leaf in flat.items():
            key = (collection, "/".join(path))
            if key not in w.out:
                raise ValueError(f"no torch weight mapped to {key}")
            val = w.out.pop(key)
            if tuple(val.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {key}: torch {val.shape} vs flax {leaf.shape}"
                )
            flat[path] = val.astype(np.asarray(leaf).dtype)
        new_vars[collection] = unflatten_dict(flat)
    if w.out:
        raise ValueError(f"converted weights with no flax home: {sorted(w.out)}")
    return new_vars


def load_torch_checkpoint(path: str, model_name: str, variables):
    """Reads a reference ``.pt`` checkpoint file and converts it.

    Accepts both raw state_dicts and full-model pickles (in which case
    ``.state_dict()`` is called). Requires torch at runtime.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "loading .pt checkpoints requires torch (CPU build is fine)"
        ) from e
    with open(path, "rb") as f:
        obj = torch.load(f, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return from_torch_state_dict(model_name, obj, variables)
