"""Network blocks composed from the geometric primitives.

Rebuilds of the reference's module layer:
- `SetAbstraction`      (models/utils/common.py:180-214)
- `SetAbstractionMSG`   (multi-scale grouping — reference lists MSG as a
                         target config but ships only SSG)
- `FeaturePropagation`  (models/utils/common.py:217-243)
- `InvResMLP`           (models/utils/common.py:246-300)
- `EdgeConv`            (models/dgcnn/dgcnn.py:60-77)
- `TNet`                (models/PointNet/PointNet.py:6-38)

All blocks are channels-last and fully jittable with static shapes.
FPS's random start point is drawn from the flax 'fps' RNG stream when
present (training); otherwise the start is deterministic (eval), making
evaluation reproducible — the reference re-randomizes at eval too
(common.py:22), which we deliberately improve on.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointseg import ops
from pointseg.nn.mlp import SharedMLP, leaky_relu_02


def _fps_key(module: nn.Module):
    return module.make_rng("fps") if module.has_rng("fps") else None


# Trace-time knob (same pattern as ops.gather.set_scatter_strategy):
# when True, bf16 EdgeConv gathers its neighbor rows in f32. bf16 rows
# are 128 B at 64 channels and gather at ~16 GB/s effective on the
# relay chip vs ~70 GB/s for 256 B f32 rows (PROFILE_r02_bf16: the four
# edge gathers are 21 ms of the 80 ms step), so paying a 2x-bytes
# upcast can still win wall time. Read at trace time; the setter below
# drops every cached executable so a flip can never reuse a stale
# trace (VERDICT round-2 weak #7).
_EDGE_GATHER_UPCAST: bool = False


def set_edge_gather_upcast(enabled: bool) -> None:
    global _EDGE_GATHER_UPCAST
    enabled = bool(enabled)
    if enabled != _EDGE_GATHER_UPCAST:
        _EDGE_GATHER_UPCAST = enabled
        jax.clear_caches()  # already-jitted callers must re-trace


class GroupedFirstLayer(nn.Module):
    """First shared-MLP layer over ball-query regions, in pre-gather form.

    The reference applies Dense(3+D -> h) to grouped cat(rel_coords,
    features) (B, C, K, 3+D) (MiniPointNet layer 1 on `group` output,
    common.py:206-209). The Dense distributes over the concat:
        W @ cat(rel, f_j) = rel @ W_r + f_j @ W_f,
    so the feature matmul runs per-POINT (N rows) before the gather
    instead of per-(region x neighbor) (C*K rows) after it — up to
    C*K/N fewer MXU FLOPs (32x in InvResMLP, where C == N). The tiny
    rel-coords matmul (3 -> h) stays per-neighbor. Numerically identical
    to the reference formulation up to fp reassociation.
    """

    width: int
    radius: float
    K: int
    normalize: bool = False  # PointNeXt grouping_norm
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, centroids, coords, features, train: bool = False, mask=None):
        from pointseg.ops.gather import gather_rows_with_coords

        idx, _ = ops.ball_query(centroids, coords, self.radius, self.K, mask=mask)
        hfeat = nn.Dense(
            self.width, use_bias=False, dtype=self.dtype, name="w_feat"
        )(features.astype(self.dtype))  # (B, N, h), pre-gather
        # one wide-row gather fetches the feature rows AND the raw f32
        # coordinates (bit-exact bf16 lanes in bf16 mode) — a separate
        # 12-byte-row coordinate gather runs ~2 GB/s (gather.py)
        gfeat, gcoords = gather_rows_with_coords(hfeat, coords, idx)
        rel = gcoords - centroids[:, :, None, :]
        if self.normalize:
            rel = rel / jnp.float32(self.radius)
        rel = rel.astype(self.dtype)
        h = gfeat + nn.Dense(
            self.width, dtype=self.dtype, name="w_rel"
        )(rel)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=self.bn_momentum,
            epsilon=1e-5, dtype=self.dtype, name="bn",
        )(h)
        return nn.relu(h)  # (B, C, K, h)


class SetAbstraction(nn.Module):
    """FPS -> ball-query group -> shared MLP -> max/avg pool.

    Returns (centroid_coords (B,C,3), features (B,C,mlps[-1])).
    """

    num_centroids: int
    radius: float
    mlps: Sequence[int]
    K: int = 32
    pooling: str = "max"
    grouping_norm: bool = False  # PointNeXt divides local coords by r
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords, features, train: bool = False, mask=None):
        idx = ops.farthest_point_sampling(
            coords, self.num_centroids, key=_fps_key(self), mask=mask
        )
        centroids = jnp.take_along_axis(coords, idx[..., None], axis=1)
        regions = GroupedFirstLayer(
            self.mlps[0], self.radius, self.K,
            normalize=self.grouping_norm, dtype=self.dtype, name="point_net0",
        )(centroids, coords, features, train=train, mask=mask)
        if len(self.mlps) > 1:
            regions = SharedMLP(self.mlps[1:], dtype=self.dtype, name="point_net")(
                regions, train=train
            )
        pooled = ops.reduce(regions, self.pooling, axis=2)
        return centroids, pooled


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping: one FPS, several radius-nested ball queries,
    per-scale MLPs, features concatenated (PointNet++ MSG, Qi et al.).

    Not present in the reference code but named in its target configs
    (BASELINE.json configs[3]).
    """

    num_centroids: int
    radii: Sequence[float]
    Ks: Sequence[int]
    mlps: Sequence[Sequence[int]]
    pooling: str = "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords, features, train: bool = False, mask=None):
        assert len(self.radii) == len(self.Ks) == len(self.mlps)
        idx = ops.farthest_point_sampling(
            coords, self.num_centroids, key=_fps_key(self), mask=mask
        )
        centroids = jnp.take_along_axis(coords, idx[..., None], axis=1)
        scales = []
        for s, (r, k, widths) in enumerate(zip(self.radii, self.Ks, self.mlps)):
            regions = GroupedFirstLayer(
                widths[0], r, k, dtype=self.dtype, name=f"scale_{s}_0"
            )(centroids, coords, features, train=train, mask=mask)
            if len(widths) > 1:
                regions = SharedMLP(widths[1:], dtype=self.dtype, name=f"scale_{s}")(
                    regions, train=train
                )
            scales.append(ops.reduce(regions, self.pooling, axis=2))
        return centroids, jnp.concatenate(scales, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + skip concat + per-point MLP.

    forward(coords_tgt, coords_src, skip_features, features) mirrors the
    reference call signature (common.py:231-243).
    """

    mlps: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords_tgt, coords_src, skip, features, train: bool = False):
        upsampled = ops.interpolate(features, coords_tgt, coords_src)
        if skip is not None:
            upsampled = jnp.concatenate([skip, upsampled], axis=-1)
        return SharedMLP(self.mlps, dtype=self.dtype, name="point_net")(
            upsampled, train=train
        )


class InvResMLP(nn.Module):
    """PointNeXt inverted-residual MLP block (common.py:246-300):
    group at same resolution (centroids == coords, normalize=True) ->
    neighbor MLP -> pool -> inverted-bottleneck point MLP (4m -> m) ->
    residual add.
    """

    radius: float
    mlp_size: int
    K: int
    pooling: str = "max"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coords, features, train: bool = False, mask=None):
        h = GroupedFirstLayer(
            self.mlp_size, self.radius, self.K, normalize=True,
            dtype=self.dtype, name="neighbour_mlp",
        )(coords, coords, features, train=train, mask=mask)  # (B, N, K, m)
        h = ops.reduce(h, self.pooling, axis=2)  # (B, N, m)
        h = SharedMLP(
            [4 * self.mlp_size, self.mlp_size], dtype=self.dtype, name="point_mlp"
        )(h, train=train)
        return coords, h + features


class _BNStats(nn.Module):
    """BatchNorm parameters/statistics with flax.linen.BatchNorm's exact
    variable layout (params {scale, bias}, batch_stats {mean, var}), for
    blocks that compute their batch statistics analytically instead of
    from a materialized input tensor. Same momentum/update rule as flax
    BN (biased variance on both paths), so swapping a real BatchNorm for
    this module is checkpoint- and torch-import-compatible.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, batch_mean, batch_var, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train and batch_mean is not None:
            mean, var = batch_mean, batch_var
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        return scale, bias, mean, var


class EdgeConv(nn.Module):
    """DGCNN edge convolution (dgcnn.py:60-77): dynamic kNN graph ->
    edge features cat(x_j - x_i, x_i) -> bias-free Dense + BN +
    LeakyReLU(0.2) -> max over neighbors.

    TPU rewrite, step 1 (pre-gather matmuls): the bias-free Dense
    distributes over the concat,
        W @ cat(x_j - x_i, x_i) = x_j @ W_e + x_i @ (W_c - W_e),
    so both matmuls run per-POINT (N rows) before the neighbor gather
    instead of per-EDGE (N*k rows) after it — ~k x fewer MXU FLOPs and
    the gathered tensor carries `out_channels` instead of 2F channels.

    PARAMETERIZATION MATTERS: the parameters stay in the reference's
    (W_e, W_c) coordinates — `w_edge` holds W_e, `w_center` holds W_c,
    and the per-point center offset is formed as d = x@W_c - x@W_e.
    Storing W_c - W_e as the parameter instead computes the SAME
    function but different GRADIENTS (dL/dW_e picks up a +dL/dW_c
    term), which under Adam is a different optimization trajectory —
    measured as a real DGCNN training-quality gap (-0.07 mIoU vs the
    torch reference, TRAIN_PARITY_dgcnn.json) before this fix.

    Step 2 (`fused=True`, default): the (B, N, k, out) edge tensor is
    never materialized at all. Writing an edge e_ij = p_j + d_i, the
    center term d_i is constant over a point's neighborhood, and
    BN + LeakyReLU compose to a per-channel MONOTONE map (slope sign =
    sign of the BN scale/var term), so
        max_j act(bn(p_j + d_i)) = act(bn(M_i + d_i)),
        M_i = max_j p_j  if the map increases, min_j p_j otherwise,
    and training-mode BN statistics over all B*N*k edges reduce to
    gathered neighbor sums:
        sum_ij e_ij   = sum_i (s_i + k d_i),           s_i = sum_j p_j
        sum_ij e_ij^2 = sum_i (q_i + 2 d_i s_i + k d_i^2), q_i = sum_j p_j^2.
    The only O(B*N*k) work left is four gather-reduces of p (two in
    eval), each fusible by XLA without materialization; BN/activation
    run on (B, N, out). Exactly equal to the unfused form (same batch
    stats, same outputs) up to fp reassociation — proven in
    tests/test_blocks.py.
    """

    out_channels: int
    k: int = 20
    dtype: Any = jnp.float32
    fused: bool = True
    remat: bool = False  # trade +22% step time for -1.5 GB temporaries

    @nn.compact
    def __call__(self, x, train: bool = False, knn_on=None, mask=None,
                 idx=None):
        """`idx` (B, N, k) reuses a precomputed neighbor graph instead
        of the per-layer feature-space kNN — the static-graph mode
        (models/dgcnn.py `static_graph`). Parameters are identical
        either way; only the graph source changes."""
        x = x.astype(self.dtype)
        if idx is None:
            idx = ops.knn_indices(x if knn_on is None else knn_on, self.k,
                                  mask=mask)
        # p_j = x_j @ W_e gathers per-neighbor; the center offset
        # d_i = x_i @ (W_c - W_e) is formed from the two per-point
        # products so the parameters remain torch's (W_e, W_c).
        p = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="w_edge")(x)  # (B, N, out)
        c = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     name="w_center")(x)  # (B, N, out)
        d = c - p
        if not self.fused:
            edges = ops.gather_neighbors(p, idx) + d[:, :, None, :]
            edges = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(edges)
            edges = leaky_relu_02(edges)
            return jnp.max(edges, axis=2)  # (B, N, out)

        upcast = _EDGE_GATHER_UPCAST and self.dtype == jnp.bfloat16

        def gather_reduce(p_, idx_):
            if upcast:
                p_ = p_.astype(jnp.float32)
            gp = ops.gather_neighbors(p_, idx_)
            out = (jnp.max(gp, axis=2).astype(self.dtype),
                   jnp.min(gp, axis=2).astype(self.dtype))
            if train:
                out += (jnp.sum(gp, axis=2), jnp.sum(gp * gp, axis=2))
            return out

        # `remat` re-gathers in the backward instead of saving the
        # (B, N, k, out) tensor as the max/min VJP residual: -1.5 GB of
        # step temporaries at DGCNN scale (4.8 -> 3.2 GB) but +22% step
        # time (122 -> 149 ms, paired A/B on chip). Off by default — the
        # default shapes fit HBM comfortably; turn on for bigger B*N*k.
        if self.remat:
            gather_reduce = jax.checkpoint(gather_reduce)
        reduced = gather_reduce(p, idx)
        g_max, g_min = reduced[0], reduced[1]
        if train:
            s, q = reduced[2], reduced[3]               # (B, N, out)
            count = p.shape[0] * p.shape[1] * self.k
            mean = jnp.sum(s + self.k * d, axis=(0, 1)) / count
            ex2 = jnp.sum(q + 2.0 * d * s + self.k * d * d, axis=(0, 1)) / count
            var = jnp.maximum(ex2 - mean * mean, 0.0)
        else:
            mean = var = None
        scale, bias, mean, var = _BNStats(
            self.out_channels, momentum=0.9, epsilon=1e-5, name="bn",
        )(mean, var, train)
        t = scale * jax.lax.rsqrt(var + 1e-5)           # per-channel slope
        extreme = jnp.where(t >= 0, g_max, g_min) + d   # argmax of the affine map
        # f32 BN params promote the elementwise tail; pin the block's
        # output dtype so downstream layers see the model compute dtype
        return leaky_relu_02((extreme - mean) * t + bias).astype(self.dtype)


class TNet(nn.Module):
    """PointNet spatial transformer (PointNet.py:6-38): per-point MLP
    64-128-1024 -> global max-pool -> FC 512-256 -> k*k matrix + I.
    """

    k: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        B = x.shape[0]
        h = SharedMLP([64, 128, 1024], dtype=self.dtype)(x, train=train)
        if mask is not None:
            h = ops.masked_reduce(h, mask, "max", axis=1)
        else:
            h = jnp.max(h, axis=1)  # (B, 1024)
        h = SharedMLP([512, 256], dtype=self.dtype)(h, train=train)
        h = nn.Dense(self.k * self.k, dtype=self.dtype)(h)
        eye = jnp.eye(self.k, dtype=h.dtype).reshape(1, self.k * self.k)
        return (h + eye).reshape(B, self.k, self.k)
