"""Experimental native row-gather kernels — a MEASURED NEGATIVE RESULT.

Context: every neighbor fetch in this framework is a batched row gather
``table (B, N, C), idx (B, M) -> (B, M, C)`` (EdgeConv edge features,
SA grouped features, 3-NN sources — the fetches replacing reference
models/utils/common.py:62-67 and models/dgcnn/dgcnn.py:41-49). XLA's
dynamic-gather services it at ~10 ns/row regardless of row width or
index order (AB_GATHER_SORTED_r02.json) — per-row overhead, ~20x off
the HBM roofline at DGCNN scale. These kernels asked whether a
hand-written Mosaic gather could beat that floor. The answer is NO,
for structural reasons, each verified on a v5e chip
(AB_NATIVE_GATHER_r02.json; tools/ab_native_gather.py reproduces):

1. **Vector path**: Mosaic vector loads/stores reject unaligned
   single-row dynamic slices of VMEM ("Slice shape along dimension 0
   must be aligned to tiling (8)"). Rows live at arbitrary indices, so
   the VPU cannot move one row at a time.
2. **DMA path, 2/3-D arrays**: TPU arrays are (8, 128)-tiled in HBM
   too, and ``make_async_copy`` enforces tile granularity on BOTH
   endpoints — the same "aligned to tiling (8)" rejection for a
   ``(1, C)`` row slice of a ``(N, C)`` table, in every memory space.
3. **DMA path, flat 1-D view**: 1-D arrays carry a full 8x128 = 1024
   -element tile ("aligned to tiling (1024), but is 512") — per-row
   DMA needs >= 4 KB f32 rows. Neighbor rows are 256-512 B.
4. **MXU path** (one-hot matmul gather): compiles and is exact, but
   2x SLOWER than XLA's gather — O(N) FLOPs per fetched row
   (documented negative result, CLAUDE.md round 1).

So every per-row mechanism the hardware exposes is either
tile-granular (8-row / 4 KB minimum, an 8x read amplification that
still pays one DMA descriptor per row) or FLOP-inflated. XLA's gather
already IS a per-row engine at ~10 ns/row; nothing in Mosaic issues
row-granular traffic faster. The levers that DO work stay in
production: width-packing (`gather_rows_with_coords` — fewer, wider
rows) and the one-hot MXU *backward* (scatter-add replacement).

The kernels below are kept as the reproducible record: they are
exactness-verified in interpret mode (tests/test_pallas.py) and their
Mosaic rejections are captured verbatim by tools/ab_native_gather.py.
They are NOT dispatched anywhere.

Gradients: gathers here are forward-only (`stop_gradient` on inputs);
the production `pointseg.ops.gather.gather_rows` keeps its custom-VJP
one-hot MXU backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring(row_copy, *, chunk: int, window: int):
    """Issue `chunk` row copies keeping `window` outstanding."""

    def start(i, carry):
        row_copy(i).start()
        return carry

    def drain_start(i, carry):
        row_copy(i - window).wait()
        row_copy(i).start()
        return carry

    def drain(i, carry):
        row_copy(i).wait()
        return carry

    jax.lax.fori_loop(0, window, start, 0)
    jax.lax.fori_loop(window, chunk, drain_start, 0)
    jax.lax.fori_loop(chunk - window, chunk, drain, 0)


def _fetch_idx_chunk(idx_src, idx_smem, sem):
    """DMA one grid cell's (chunk,) index slice HBM->SMEM and wait.

    Indices can't ride a BlockSpec: tiled SMEM blocks are rejected by
    Mosaic and scalar-prefetching a whole (B, M) table overflows the
    1 MB SMEM at DGCNN scale (8x81920 int32 = 2.6 MB)."""
    cp = pltpu.make_async_copy(idx_src, idx_smem, sem)
    cp.start()
    cp.wait()


def _dma_kernel(idx_hbm, table_ref, out_ref, idx_smem, idx_sem, sems,
                *, chunk: int, window: int):
    """One grid cell: `chunk` per-row HBM->HBM DMAs, `window` in flight.

    Mosaic rejects this at compile: the (1, C) row slices violate the
    8-sublane tiling of the (N, C) minor dims (barrier 2 above)."""
    b = pl.program_id(0)
    base = pl.program_id(1) * chunk
    _fetch_idx_chunk(idx_hbm.at[b, pl.ds(base, chunk)], idx_smem, idx_sem)

    def row_copy(i):
        j = idx_smem[i]
        return pltpu.make_async_copy(
            table_ref.at[b, pl.ds(j, 1), :],
            out_ref.at[b, pl.ds(base + i, 1), :],
            sems.at[i % window],
        )

    _ring(row_copy, chunk=chunk, window=window)


@functools.partial(jax.jit, static_argnames=("chunk", "window"))
def gather_rows_dma(
    table: jax.Array, idx: jax.Array, *, chunk: int = 1024, window: int = 8
) -> jax.Array:
    """Row gather issuing one HBM->HBM DMA per row (ringed semaphores).

    Args:
        table: (B, N, C) feature rows.
        idx: (B, M) int32 row indices; M must be a multiple of `chunk`.

    Returns:
        (B, M, C) gathered rows, forward-only. Exact in interpret mode;
        rejected by Mosaic on hardware (see module docstring). The
        default chunk=1024 matches the 1024-element 1-D tiling the
        (chunk,) int32 SMEM index fetch needs on hardware, so the
        recorded Mosaic rejection isolates the ROW-COPY barrier, not
        the index fetch (ADVICE.md round 2).
    """
    table = jax.lax.stop_gradient(table)
    idx = jax.lax.stop_gradient(idx.astype(jnp.int32))
    B, N, C = table.shape
    M = idx.shape[1]
    if M % chunk or window > chunk:
        raise ValueError(f"M={M} % chunk={chunk} != 0 or window > chunk")
    grid = (B, M // chunk)
    return pl.pallas_call(
        functools.partial(_dma_kernel, chunk=chunk, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idx: DMA'd per cell
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # rows land in HBM
        out_shape=jax.ShapeDtypeStruct((B, M, C), table.dtype),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((window,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)


def _flat_kernel(idx_hbm, table_ref, out_ref, idx_smem, idx_sem, sems,
                 *, chunk: int, window: int, C: int):
    """One grid cell: per-row DMAs on flat 1-D views.

    Mosaic rejects this at compile unless C is a multiple of 1024
    elements: 1-D arrays carry a full 8x128 tile (barrier 3 above)."""
    base = pl.program_id(0) * chunk
    _fetch_idx_chunk(idx_hbm.at[pl.ds(base, chunk)], idx_smem, idx_sem)

    def row_copy(i):
        j = idx_smem[i]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(j * C, C)],
            out_ref.at[pl.ds((base + i) * C, C)],
            sems.at[i % window],
        )

    _ring(row_copy, chunk=chunk, window=window)


@functools.partial(jax.jit, static_argnames=("chunk", "window"))
def gather_rows_flat(
    table: jax.Array, idx: jax.Array, *, chunk: int = 1024, window: int = 8
) -> jax.Array:
    """Row gather over FLAT views: table (R, C) + absolute idx (Mrows,).

    The flat addressing sidesteps 2-D sublane tiling, leaving the 1-D
    tile-granularity barrier as the sharpest measurement: Mosaic
    rejects any row width not a multiple of 1024 elements (4 KB f32).

    Returns:
        (Mrows, C) gathered rows, forward-only. Exact in interpret
        mode; rejected by Mosaic on hardware for C < 1024.
    """
    table = jax.lax.stop_gradient(table)
    idx = jax.lax.stop_gradient(idx.astype(jnp.int32))
    R, C = table.shape
    (Mrows,) = idx.shape
    if Mrows % chunk or window > chunk:
        raise ValueError(f"M={Mrows} % chunk={chunk} != 0 or window > chunk")
    out = pl.pallas_call(
        functools.partial(_flat_kernel, chunk=chunk, window=window, C=C),
        grid=(Mrows // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Mrows * C,), table.dtype),
        scratch_shapes=[
            pltpu.SMEM((chunk,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((window,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table.reshape(-1))
    return out.reshape(Mrows, C)
