"""Neighbor-row gather with an MXU-matmul backward.

Every geometric block in this framework gathers rows of a per-batch
feature table by neighbor indices — EdgeConv edge features
(reference models/dgcnn/dgcnn.py:41-49), SA-stage grouped features
(models/utils/common.py:62-67), 3-NN interpolation sources. The forward
gather is cheap (XLA's dynamic-gather runs ~70 GB/s on v5e); the
BACKWARD is not: autodiff emits a scatter-add, which XLA serializes at
~13-19 GB/s and which profiling shows is the single largest device
cost in both DGCNN (~36 ms/step) and PointNet++ (~3.6 ms/step).

`gather_rows` therefore carries a custom VJP that computes the
cotangent accumulation as a one-hot matmul on the MXU:

    ct_table[b] = one_hot(idx[b]).T @ ct_out[b]

The one-hot operand never materializes — XLA fuses the iota/compare
into the matmul's operand read. Measured at DGCNN scale
(B=8, N=4096, E=81920, C=64; SCATTER_BENCH.json):

    xla scatter-add             13.3 ms   exact
    one-hot f32 (HIGHEST)        8.6 ms   exact products, reassociated
    one-hot bf16 hi/lo split     6.6 ms   ~4e-5 absolute error
    sort + sorted-scatter       21.7 ms   (sort dominates)

Strategies (`POINTSEG_SCATTER` env var or `set_scatter_strategy`):

- ``auto`` (default): ``onehot`` on TPU-class backends, ``xla``
  elsewhere (CPU/GPU scatter-adds are fine, and a dense one-hot
  contraction on CPU would be far slower).
- ``onehot``: f32 one-hot matmul at ``Precision.HIGHEST`` — every
  product is exact, so the result differs from the scatter-add only by
  summation order (the same class of difference as any XLA fusion
  change).
- ``bf16x2``: the updates split into exactly-representable bf16
  hi/lo halves and accumulate through two full-rate MXU passes
  (~2x faster than f32-HIGHEST, ~1e-4-relative accuracy — well below
  the f32 conditioning noise of these models' gradients). The hi half
  is wrapped in an `optimization_barrier`: XLA's double-rounding
  simplification otherwise folds ``u - f32(bf16(u))`` to zero and
  silently degrades the split to plain bf16.
- ``xla``: the scatter-add autodiff would emit anyway.

Indices are treated as non-differentiable (they are selections).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_FORCED: str | None = None
_VALID = ("auto", "xla", "onehot", "onehot_t", "bf16x2")


def set_scatter_strategy(value: str | None) -> None:
    """Force a gather-backward strategy; None restores auto-detection.

    The strategy is read at trace time inside the gather's custom VJP,
    so changing it drops every cached executable (`jax.clear_caches`) —
    an already-jitted train step can never keep running a stale
    strategy (VERDICT round-2 weak #7)."""
    global _FORCED
    if value is not None and value not in _VALID:
        raise ValueError(f"scatter strategy must be one of {_VALID}")
    if value != _FORCED:
        _FORCED = value
        jax.clear_caches()


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return dev.platform in ("tpu", "axon") or "TPU" in getattr(
            dev, "device_kind", ""
        )
    except Exception:
        return False


def scatter_strategy() -> str:
    s = _FORCED
    if s is None:
        s = os.environ.get("POINTSEG_SCATTER", "auto")
        if s not in _VALID:
            raise ValueError(
                f"POINTSEG_SCATTER={s!r}; must be one of {_VALID}"
            )
    if s != "auto":
        return s
    return "onehot" if _on_tpu() else "xla"


# ---- forward-gather strategy (VERDICT round-2 item 3) ----
#
# XLA's dynamic row gather costs ~10 ns/ROW on v5e regardless of width
# or locality (AB_GATHER_SORTED_r02.json) — pure per-row descriptor
# overhead. For SMALL tables (SA3/SA4: N=256/64) a one-hot MXU matmul
# fetches the same rows as a dense contraction whose O(N) FLOPs/row are
# nearly free, sidestepping the descriptor floor entirely. The result
# is EXACT: every product is 1.0*x or 0.0, and adding zeros in f32
# accumulation changes nothing (bf16 tables contract at full MXU rate;
# f32 tables use Precision.HIGHEST so operands aren't rounded).
#
# Chip A/B (AB_FWD_GATHER_r03_ops.json, v5e, B=8): the win is
# DTYPE-dependent, not just size-dependent. bf16 rows are half-width
# (128 B at 64 ch) and the XLA gather runs them at ~16 GB/s effective,
# while the bf16 one-hot contraction runs at full MXU rate — one-hot
# WINS AT EVERY MEASURED TABLE SIZE in bf16 (1.09-1.27x at SA shapes,
# 1.95x at the DGCNN edge shape N=4096/M=81920/C=64: 6.66 -> 3.41 ms).
# In f32 the HIGHEST-precision contraction is 6 MXU passes and loses
# except near N=256 (0.75-1.12x), so f32 keeps take_along_axis.
# End-to-end bf16 train steps (same file, model_level): PointNeXt
# 19.15 -> 14.24 ms, PointNet++ 12.62 -> 10.21 ms, DGCNN
# 79.39 -> 71.32 ms.
#
# Modes (POINTSEG_GATHER_FWD / set_gather_forward):
#   auto   — one-hot when on TPU and N <= the dtype's threshold:
#            bf16 POINTSEG_GATHER_FWD_N_BF16 (default 4096 — every
#            production table qualifies), f32 POINTSEG_GATHER_FWD_N
#            (default 0 = off).
#   xla    — always take_along_axis (pre-round-3 behavior).
#   onehot — always the matmul (measurement mode).
_FWD_FORCED: str | None = None
_FWD_VALID = ("auto", "xla", "onehot")


def set_gather_forward(value: str | None) -> None:
    """Force the forward-gather strategy; None restores auto. Clears
    jit caches on change (trace-time knob, VERDICT round-2 weak #7)."""
    global _FWD_FORCED
    if value is not None and value not in _FWD_VALID:
        raise ValueError(f"gather forward must be one of {_FWD_VALID}")
    if value != _FWD_FORCED:
        _FWD_FORCED = value
        jax.clear_caches()


def _fwd_threshold(dtype) -> int:
    if dtype == jnp.bfloat16:
        return int(os.environ.get("POINTSEG_GATHER_FWD_N_BF16", "4096"))
    return int(os.environ.get("POINTSEG_GATHER_FWD_N", "0"))


def gather_forward_strategy(n_rows: int, dtype=jnp.float32) -> str:
    s = _FWD_FORCED
    if s is None:
        s = os.environ.get("POINTSEG_GATHER_FWD", "auto")
        if s not in _FWD_VALID:
            raise ValueError(
                f"POINTSEG_GATHER_FWD={s!r}; must be one of {_FWD_VALID}")
    if s != "auto":
        return s
    return (
        "onehot" if _on_tpu() and n_rows <= _fwd_threshold(dtype)
        else "xla"
    )


def _take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Forward row fetch: table (B, N, C), idx (B, M) -> (B, M, C)."""
    N = table.shape[1]
    if gather_forward_strategy(N, table.dtype) == "onehot":
        if table.dtype == jnp.bfloat16:
            oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
            return jnp.einsum(
                "bmn,bnc->bmc", oh, table,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        oh = jax.nn.one_hot(idx, N, dtype=table.dtype)
        return jnp.einsum(
            "bmn,bnc->bmc", oh, table,
            preferred_element_type=table.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    return jnp.take_along_axis(table, idx[..., None], axis=1)


@partial(jax.custom_vjp, nondiff_argnums=())
def _gather_flat(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table (B, N, C), idx (B, M) int -> (B, M, C)."""
    return _take_rows(table, idx)


def _gather_flat_fwd(table, idx):
    # residual leaves must be JAX types: carry the table dtype in a
    # zero-size array and its row count as a Python int
    proto = jnp.zeros((0,), table.dtype)
    return _gather_flat(table, idx), (idx, table.shape[1], proto)


def _scatter_onehot(ct, idx, n_rows):
    if ct.dtype == jnp.bfloat16:
        # bf16 cotangents (bf16-activation models): a SINGLE full-rate
        # bf16 MXU pass is already exact — one-hot entries are 0/1 and
        # the ct values carry no more precision than bf16, so every
        # product is exact and sums accumulate in f32 via
        # preferred_element_type. Skipping the 6-pass HIGHEST einsum
        # here is free accuracy-wise and ~4x cheaper.
        oh = jax.nn.one_hot(idx, n_rows, dtype=jnp.bfloat16)
        return jnp.einsum(
            "bmn,bmc->bnc", oh, ct, preferred_element_type=jnp.float32,
        )
    oh = jax.nn.one_hot(idx, n_rows, dtype=jnp.float32)  # fused, not stored
    return jnp.einsum(
        "bmn,bmc->bnc",
        oh,
        ct.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _scatter_onehot_t(ct, idx, n_rows):
    # Same contraction with the one-hot built PRE-TRANSPOSED (B, n, m):
    # the comparison broadcast fuses into the operand read either way,
    # but this orientation lets XLA consume ct (B, m, c) with its
    # contraction dim already row-major — probing whether the profiled
    # 167-335 MB cotangent layout copies disappear.
    oh = (idx[:, None, :] == jnp.arange(n_rows, dtype=idx.dtype)[None, :, None])
    return jnp.einsum(
        "bnm,bmc->bnc",
        oh.astype(jnp.float32),
        ct.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _scatter_bf16x2(ct, idx, n_rows):
    oh = jax.nn.one_hot(idx, n_rows, dtype=jnp.bfloat16)
    ct = ct.astype(jnp.float32)
    # barrier: see module docstring (XLA folds the split away otherwise)
    hi = jax.lax.optimization_barrier(ct.astype(jnp.bfloat16))
    lo = (ct - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
    return (jnp.einsum("bmn,bmc->bnc", oh, hi, **kw)
            + jnp.einsum("bmn,bmc->bnc", oh, lo, **kw))


def _scatter_xla(ct, idx, n_rows):
    B = ct.shape[0]
    z = jnp.zeros((B, n_rows, ct.shape[-1]), ct.dtype)
    return z.at[jnp.arange(B)[:, None], idx].add(ct)


def _gather_flat_bwd(res, ct):
    idx, n_rows, proto = res
    dtype = proto.dtype
    strategy = scatter_strategy()
    if strategy == "onehot":
        ct_table = _scatter_onehot(ct, idx, n_rows)
    elif strategy == "onehot_t":
        ct_table = _scatter_onehot_t(ct, idx, n_rows)
    elif strategy == "bf16x2":
        ct_table = _scatter_bf16x2(ct, idx, n_rows)
    else:
        ct_table = _scatter_xla(ct, idx, n_rows)
    return ct_table.astype(dtype), np.zeros(idx.shape, jax.dtypes.float0)


_gather_flat.defvjp(_gather_flat_fwd, _gather_flat_bwd)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Gathers rows of a batched table by integer indices.

    Args:
        table: (B, N, C) feature rows.
        idx: (B, ...) int32 indices into N (any trailing shape).

    Returns:
        (B, *idx.shape[1:], C) gathered rows. Differentiable in
        `table`; the backward runs the strategy-selected MXU scatter
        (module docstring).
    """
    B = table.shape[0]
    flat = _gather_flat(table, idx.reshape(B, -1))
    return flat.reshape(*idx.shape, table.shape[-1])


def gather_rows_with_coords(
    features: jax.Array, coords: jax.Array, idx: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """One gather for the (features, coords) table pair SA grouping needs.

    Every SetAbstraction-style block fetches, with the SAME ball-query
    indices, (a) the pre-gather feature matmul rows and (b) the raw f32
    coordinates for the relative-position term. Issued separately, (b)
    is a 12-byte-row gather that runs at ~2 GB/s on v5e (per-row fetch
    overhead dominates tiny rows; PROFILE_r02_pnpp_bf16.json: 1.50 ms
    of a 12.6 ms step at SA1 scale). Packing both tables into one
    wide-row gather hides the coordinate bytes in the feature fetch:
    measured 3.25 ms vs 4.85 ms for the separate pair at SA1 scale
    (AB_GATHER_WIDTH_r02.json).

    When `features` is bfloat16 the f32 coordinates ride along as an
    arithmetic bf16 hi/lo split (hi barriered — the same
    double-rounding-folding guard as `_scatter_bf16x2`): measured
    ~7e-6 RELATIVE reconstruction error, below the bf16 cast the
    relative-coordinate term gets downstream anyway. A bitcast packing
    (bit-exact in theory) does NOT survive the gather: arbitrary
    low-half bit patterns include bf16 SUBNORMALS and the TPU gather
    path flushes them to zero (measured: low 16 bits zeroed, ~2e-3
    relative coordinate error).

    Coordinates are selection geometry, not a parameter path: they are
    `stop_gradient`ed here, which both matches their (DCE'd) role in
    the separate formulation and keeps the packed backward from
    scattering into dead channels. `features` stays differentiable
    through the strategy-selected MXU backward.

    Replaces the grouped fetches around reference
    models/utils/common.py:62-67 (`group`'s index_points of xyz and
    points with one idx).
    """
    coords = jax.lax.stop_gradient(coords)
    B, N = features.shape[0], features.shape[1]
    h = features.shape[-1]
    if features.dtype == coords.dtype:
        buf = jnp.concatenate([features, coords], axis=-1)
        g = gather_rows(buf, idx)
        return g[..., :h], g[..., h:]
    if features.dtype == jnp.bfloat16 and coords.dtype == jnp.float32:
        c = coords.shape[-1]
        hi = jax.lax.optimization_barrier(coords.astype(jnp.bfloat16))
        lo = (coords - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        buf = jnp.concatenate([features, hi, lo], axis=-1)
        g = gather_rows(buf, idx)
        gc = (g[..., h:h + c].astype(jnp.float32)
              + g[..., h + c:].astype(jnp.float32))
        return g[..., :h], gc
    # unusual dtype pairing: two plain gathers
    return gather_rows(features, idx), gather_rows(coords, idx)
