#!/usr/bin/env python
"""Diagnostic: single-step DGCNN gradient parity, torch vs pointseg.

Same init (torch state_dict imported), same batch, dropout off on both
sides. If per-leaf grads match at the f32 noise floor, DGCNN step
dynamics are equivalent and the observed training-parity gap must come
from the differing default initializations (flax lecun_normal vs torch
kaiming_uniform(a=sqrt5)); if they diverge, there is a real dynamics
bug to chase.
"""
import copy
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch

import flax
from models.dgcnn.dgcnn import DGCNNWithColor as Ref
from Training.train_model import masked_onehot_cross_entropy as ref_ce

from pointseg.io.torch_import import from_torch_state_dict
from pointseg.models import DGCNNWithColor
from pointseg.train.loss import masked_onehot_cross_entropy


def grad_state_dict(model):
    out = {
        k: (p.grad if p.grad is not None else torch.zeros_like(p))
        for k, p in model.named_parameters()
    }
    for k, v in model.named_buffers():  # placeholders; params-only compare
        out[k] = torch.zeros_like(v) if v.dtype.is_floating_point else v
    return out


def main():
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

    if "--unfused" in sys.argv:
        # force the unfused EdgeConv path for localization (explicit
        # name= keeps the variable tree identical)
        import pointseg.models.dgcnn as dg
        import pointseg.nn.blocks as blocks_mod

        class UnfusedEdgeConv(blocks_mod.EdgeConv):
            fused: bool = False

        dg.EdgeConv = UnfusedEdgeConv
        print("== UNFUSED EdgeConv path ==")
    model = DGCNNWithColor(num_classes=14, k=8, emb_dims=128, dropout=0.0)
    v0 = model.init({"params": jax.random.key(0)}, jnp.array(x), train=False)
    variables = from_torch_state_dict("DeepGraphCnn", sd0, dict(v0))

    def loss_fn(params):
        logits, upd = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.array(x), train=True, mutable=["batch_stats"],
        )
        return masked_onehot_cross_entropy(
            logits, jnp.array(y), jnp.array(lengths)), upd["batch_stats"]

    (loss_j, _), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"])
    with jax.disable_jit():
        (_, _), grads_eager = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])

    print(f"loss torch={float(loss_t):.6f} jax={float(loss_j):.6f}")

    want_tree = from_torch_state_dict(
        "DeepGraphCnn", grad_state_dict(ref), dict(v0))
    fw = flax.traverse_util.flatten_dict(want_tree["params"], sep="/")
    fg = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads), sep="/")
    fe = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, grads_eager), sep="/")
    dots = na = nb = 0.0
    worst = (0.0, None)
    for k, want in fw.items():
        got = fg[k]
        cross = np.linalg.norm(got - want)
        noise = np.linalg.norm(got - fe[k]) + 1e-12
        rel = cross / (np.linalg.norm(want) + 1e-12)
        ratio = cross / noise
        if rel > worst[0]:
            worst = (rel, k, cross, noise)
        print(f"{k:60s} rel={rel:9.2e} cross/noise={ratio:9.1f}")
        dots += float(got.ravel() @ want.ravel())
        na += float((got ** 2).sum())
        nb += float((want ** 2).sum())
    print(f"\nglobal cosine = {dots / np.sqrt(na * nb):.6f}")
    print(f"worst leaf: {worst}")


if __name__ == "__main__":
    main()
