"""Two-level top-k extraction — EXPERIMENTAL, CLOSED AS NOT-A-WIN.

STATUS (2026-08-18, round 2; reconfirmed round 4): exact on chip at
every (depth, tile, S) tested (VERIFY_TPU_r04.json::
select2l_compiled_vs_flat) but NO FASTER than the flat kernel once
refill is correct (chip A/B in docs/KERNELS.md "two-level selection");
NOT dispatched — env-gated behind POINTSEG_SELECT2L for re-evaluation
on future hardware only. The dispatched production path is
ops/pallas/knn.py / ops/pallas/ballquery.py (flat selection).

Shared by the kNN and ball-query kernels: both need the k best entries
of each row of a (TILE, N) score block in (value desc, col asc) order —
exactly `lax.top_k` semantics with first-occurrence tie handling. The
flat formulation pays k full passes over the block (max + tie-min +
mask-update each); at DGCNN/SA scale that is the dominant VPU cost of
the kernels (PROFILE_r02_bf16.json).

Design (chip-measured on v5e, see BENCHMARKS.md "two-level selection"):

- Partition the N columns into S STRIDED lanes: lane s holds columns
  {w*S + s} for the W = N/S width-S slices, so the level-2 state is a
  (TILE, S) array — native vector layout, no cross-lane shuffles.
- Level 1: ONE fold over the W slices builds a per-lane top-`depth`
  stack (value, w) via a compare-swap insertion chain (ties keep the
  lowest w: strictly-greater swaps over ascending w).
- Level 2: k iterations on (TILE, S) arrays. Pick the global max among
  lane heads; ties across lanes resolve by min PACKED column w*S + s
  (the true global column), matching first-occurrence semantics; pop
  the winning lane's stack.
- A lane consumed `depth` times re-fills LAZILY under `pl.when`: one
  masked fold over the W slices recomputes the lane's next element
  lex-after the last consumed (value desc, col asc). Exactness never
  depends on the stack depth; pathological inputs only degrade speed.

Why the depth matters: with randperm-sampled blocks the k winners land
in effectively RANDOM lanes, and the refill predicate is any-row-in-
tile, so shallow stacks refill nearly every iteration (birthday
collisions: at depth 2, k=20, S=256 some row of a 256-row tile pends
almost always — measured 15 ms, SLOWER than flat). Expected refills per
tile fall as rows * C(k, depth) / S^(depth-1): depth 4 at k<=20 or 5 at
k<=48 makes them ~zero while the insertion chain stays cheap.

Why refs + pl.when (not lax.cond on values): Mosaic lowers value-level
cond to predicated execution of BOTH branches — the refill fold then
runs every iteration and costs more than it saves (measured 15.8 ms vs
2.8 ms without it). State lives in run_scoped VMEM scratch and the
refill is a side-effecting `pl.when` body, which lowers to a real
branch.

Scoped-VMEM budget: state is (2*depth + 3) (TILE, S) arrays; together
with the (TILE, N) distance block this must fit the 16 MB scoped-vmem
limit — TILE=256 with S=256 leaves ample headroom (the TILE=512 variant
OOMs at S=512).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def default_depth(k: int) -> int:
    """Stack depth making lazy refills ~never fire (see module doc)."""
    if k <= 3:
        return min(k, 3)
    if k <= 20:
        return 4
    return 5


def two_level_extract(dist_ref, k: int, seg: int, emit, depth: int | None = None) -> None:
    """Extracts the k largest entries per row of `dist_ref`.

    Args:
        dist_ref: (TILE, N) f32 VMEM ref, already populated. All values
            must be FINITE (-inf is the internal empty sentinel). Not
            modified.
        k: number of extractions (static).
        seg: lane count S; requires N % S == 0 and N // S >= 2.
        emit: callback ``emit(j, packed_col, value)`` invoked once per
            extraction with the (TILE, 1) int32 global column w*S+s and
            the (TILE, 1) f32 value, in (value desc, col asc) order.
        depth: per-lane stack depth (default :func:`default_depth`).
    """
    tile, n = dist_ref.shape
    S = seg
    W = n // S
    T = default_depth(k) if depth is None else depth
    if k > 1:
        T = max(T, 2)  # the consume shift needs a second stack level
    body = functools.partial(
        _extract_body, dist_ref, k=k, S=S, W=W, T=T, tile=tile, emit=emit
    )
    pl.run_scoped(
        body,
        *([pltpu.VMEM((tile, S), jnp.float32)] * T       # value stack
          + [pltpu.VMEM((tile, S), jnp.int32)] * T       # w stack
          + [pltpu.VMEM((tile, S), jnp.int32)] * T       # emptiness stack
          + [pltpu.VMEM((tile, S), jnp.float32),         # last consumed value
             pltpu.VMEM((tile, S), jnp.int32),           # ... and its w
             pltpu.VMEM((tile, S), jnp.int32)]),         # refill-pending flag
    )


def _lane_slice(dist_ref, w, S):
    """(tile, S) slice w of the distance block — dynamic lane offset
    (multiples of S >= 128 satisfy Mosaic's lane tiling; chip-verified)."""
    return dist_ref[:, pl.ds(w * S, S)]


def _extract_body(dist_ref, *refs, k, S, W, T, tile, emit):
    vs_r = refs[:T]
    as_r = refs[T:2 * T]
    es_r = refs[2 * T:3 * T]
    vl_r, wl_r, pend_r = refs[3 * T], refs[3 * T + 1], refs[3 * T + 2]

    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, S), 1)
    big = jnp.int32(2**30)
    neg = jnp.float32(-jnp.inf)

    # level 1: per-lane sorted top-T via a prefix-insertion fold. The
    # stack is value-descending, so ge[t] = d > vs[t] is monotone in t
    # and the insertion level is its first True:
    #   new vs[t] = vs[t-1] if inserted above t, d if inserted at t,
    #   else unchanged — all reads from OLD levels (no carry chain).
    # Strict > means equal values insert BELOW earlier (lower-w) ones:
    # first-occurrence tie order, same as the flat kernels/lax.top_k.
    #
    # The fold runs as a fori_loop updating the stack REFS in place —
    # a Python-unrolled fold keeps every iteration's temporaries live
    # on Mosaic's scoped-vmem stack (measured: W=16 at tile=128 blows
    # the 16 MB limit by ~11 MB), and a stacked (T, tile, S) value
    # carry still doubles the state (tile=256 exceeds the limit by
    # fractions of a MB). In-place keeps the live set at ~T+4 (tile, S)
    # temporaries. Levels update DESCENDING so each step reads only
    # old values (new[t] depends on old[t-1], old[t]).
    for t in range(T):
        vs_r[t][:, :] = jnp.full((tile, S), neg, jnp.float32)
        as_r[t][:, :] = jnp.zeros((tile, S), jnp.int32)

    def l1_body(w, carry):
        d = _lane_slice(dist_ref, w, S)             # (tile, S)
        wv = jnp.broadcast_to(w, (tile, S)).astype(jnp.int32)
        ge = [d > vs_r[t][:, :] for t in range(T)]
        for t in range(T - 1, -1, -1):
            above = ge[t - 1] if t > 0 else jnp.zeros((tile, S), jnp.bool_)
            vs_r[t][:, :] = jnp.where(
                above, vs_r[t - 1][:, :] if t > 0 else d,
                jnp.where(ge[t], d, vs_r[t][:, :])
            )
            as_r[t][:, :] = jnp.where(
                above, as_r[t - 1][:, :] if t > 0 else wv,
                jnp.where(ge[t], wv, as_r[t][:, :])
            )
        return carry

    jax.lax.fori_loop(0, W, l1_body, jnp.int32(0))
    for t in range(T):
        es_r[t][:, :] = (vs_r[t][:, :] == neg).astype(jnp.int32)
    vl_r[:, :] = jnp.zeros((tile, S), jnp.float32)
    wl_r[:, :] = jnp.zeros((tile, S), jnp.int32)
    pend_r[:, :] = jnp.zeros((tile, S), jnp.int32)

    ones_i = jnp.ones((tile, S), jnp.int32)
    zeros_i = jnp.zeros((tile, S), jnp.int32)
    for j in range(k):
        if j > 0:
            @pl.when(jnp.any(pend_r[:, :] == 1))
            def _():
                p = pend_r[:, :] == 1
                vl = vl_r[:, :]
                wl = wl_r[:, :]

                def refill_body(w, carry):
                    nv, na = carry
                    d = _lane_slice(dist_ref, w, S)
                    ok = jnp.logical_or(
                        d < vl, jnp.logical_and(d == vl, w > wl)
                    )
                    cand = jnp.where(ok, d, neg)
                    b = cand > nv
                    nv = jnp.where(b, cand, nv)
                    na = jnp.where(
                        b, jnp.broadcast_to(w, (tile, S)).astype(jnp.int32),
                        na,
                    )
                    return nv, na

                nv, na = jax.lax.fori_loop(
                    0, W, refill_body,
                    (jnp.full((tile, S), neg, jnp.float32),
                     jnp.zeros((tile, S), jnp.int32)),
                )
                vs_r[0][:, :] = jnp.where(p, nv, vs_r[0][:, :])
                as_r[0][:, :] = jnp.where(p, na, as_r[0][:, :])
                es_r[0][:, :] = jnp.where(
                    p, (nv == neg).astype(jnp.int32), es_r[0][:, :]
                )
                pend_r[:, :] = zeros_i

        v1 = vs_r[0][:, :]
        a1 = as_r[0][:, :]
        m = jnp.max(v1, axis=1, keepdims=True)
        packed = jnp.min(
            jnp.where(v1 == m, a1 * S + cols, big), axis=1, keepdims=True
        )
        emit(j, packed, m)
        if j == k - 1:  # final extraction: state updates are dead
            continue
        is_lane = cols == (packed % S)
        vl_r[:, :] = jnp.where(is_lane, m, vl_r[:, :])
        wl_r[:, :] = jnp.where(is_lane, packed // S, wl_r[:, :])
        # the incoming head is empty -> lane must refill before it can
        # win again (exhausted lanes refill to -inf/empty once and are
        # never consumed after)
        pend_r[:, :] = jnp.where(
            jnp.logical_and(is_lane, es_r[1][:, :] == 1), ones_i, pend_r[:, :]
        )
        for t in range(T - 1):
            vs_r[t][:, :] = jnp.where(is_lane, vs_r[t + 1][:, :], vs_r[t][:, :])
            as_r[t][:, :] = jnp.where(is_lane, as_r[t + 1][:, :], as_r[t][:, :])
            es_r[t][:, :] = jnp.where(is_lane, es_r[t + 1][:, :], es_r[t][:, :])
        vs_r[T - 1][:, :] = jnp.where(is_lane, neg, vs_r[T - 1][:, :])
        es_r[T - 1][:, :] = jnp.where(is_lane, ones_i, es_r[T - 1][:, :])


def pick_seg(n: int, max_seg: int = 256, max_w: int = 32) -> int | None:
    """Largest multiple-of-128 divisor of n <= max_seg with >=2 slices,
    or None when the two-level layout doesn't apply.

    `max_w` bounds the slice count W = n/s: the level-1/refill folds are
    Python-unrolled over W, so huge-N eval buckets (the defensive
    65536-point bucket would unroll 256 slices) fall back to the flat
    kernel instead of exploding program size/compile time."""
    s = max_seg
    while s >= 128:
        if n % s == 0 and 2 <= n // s <= max_w:
            return s
        s -= 128
    return None
