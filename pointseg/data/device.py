"""Device-resident (on-HBM) block store with jitted batch sampling.

The reference feeds training from a host-side torch DataLoader that
re-reads and re-samples block files every epoch
(data_processing/block_datasets.py:104-181). On TPU that host path is
the wrong shape: each step needs ~8 blocks of fresh data, every block
is an `np.load` + zlib inflate + H2D copy, and the relayed runtime adds
a round trip on top. The TPU-native replacement keeps the ENTIRE
training split resident in HBM and performs block choice + within-block
point sampling + one-hot encoding inside the jitted step, so steady-
state training does zero per-step host I/O.

Layout: blocks are stored flat — `points (T, 9)` / `labels (T,)` with
per-block `offsets (M,)` / `counts (M,)` — no padding waste, so HBM cost
is exactly the dataset size (S3DIS total ≈ 273M points ≈ 10 GB f32).

NOTE on capacity: a full v5e chip has 16 GB of HBM, but the usable
relay grant VARIES BY SESSION — allocation probes measured ~7.9 GB in
one round-3 session and 15.5 GB in another (PIPELINE_BENCH_r03.json).
At the small grant the 10 GB f32 table does NOT fit.
`CompactDeviceStore` packs the canonical S3DIS block format into
16 bytes/point (xyz f32 bits + rgb/label bytes in one u32 word,
per-block centers separate) — 4.4 GB for all of S3DIS — and
reconstructs the 9 features inside the jitted sampler, bit-identical
to the flat store. `device_store_or_host_loader` tries flat → compact
→ chunked host prefetcher, in that order, so training input adapts to
whatever grant the session actually has.

Sampling semantics: the reference samples `randperm(n)[:k]` when a
block has more than k points and `randint(0, n, k)` otherwise
(block_datasets.py:119-128). The flat layout uses with-replacement
`floor(u * n)` sampling for every block — identical in expectation to
the reference's short-block branch and statistically indistinguishable
from randperm at S3DIS scale (k=4096 from n≈10-40k); the host
`BlockDataset` path keeps the exact reference semantics for anyone who
needs bit-level parity.

Epoch structure mirrors the reference loader: one device-side
permutation of the block ids per epoch, consumed batch-by-batch; short
final batches are filled with id −1 rows that come back with length 0
(masked out of loss/metrics by the existing static-shape convention).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointseg.data.s3dis import BLOCK_SIZE, NUM_S3DIS_CLASSES


class NotPackableError(ValueError):
    """The block table is not exactly representable in the compact
    16-byte/point layout (non-u8 rgb, >255 classes, or rel coords that
    are not the IEEE f32 difference xyz - per-block-center)."""


def pack_block_table(
    points: np.ndarray, labels: np.ndarray, counts: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Packs a canonical 9-feature block table into 16 bytes/point.

    Input: `points` (T, 9) f32 rows `[xyz, rgb, xyz - center]` (the
    block preprocessor's format, pointseg/data/blocks.py::augment_points
    / reference preprocess_dataset.py:73-90), `labels` (T,) ints,
    `counts` (M,) points per block. Output:

    - `packed` (T, 4) u32 — the xyz f32 BIT PATTERNS (words 0-2) and
      `(r<<24)|(g<<16)|(b<<8)|label` (word 3);
    - `centers` (M, 3) f32 per-block centers.

    The packing is verified EXACT before returning: rgb must be integer
    0-255 (true for real S3DIS, whose colors are u8), labels must fit a
    byte, and `xyz - center` must reproduce the stored rel coords
    bit-for-bit (IEEE f32 subtraction is deterministic, so the device
    recompute matches too). Raises NotPackableError otherwise — callers
    fall back to the flat f32 store or the host loader.
    """
    points = np.ascontiguousarray(points, np.float32)
    labels = np.asarray(labels)
    counts = np.asarray(counts, np.int64)
    if points.ndim != 2 or points.shape[1] != 9:
        raise NotPackableError(
            f"compact store needs (T, 9) block features, got {points.shape}")
    if counts.sum() != points.shape[0]:
        raise ValueError("counts do not sum to the table length")
    if (counts <= 0).any():
        raise ValueError("compact store requires non-empty blocks")
    offsets = np.zeros_like(counts)
    np.cumsum(counts[:-1], out=offsets[1:])

    rgb = points[:, 3:6]
    if rgb.size and (
        (rgb < 0).any() or (rgb > 255).any() or (rgb != np.round(rgb)).any()
    ):
        raise NotPackableError("rgb features are not exact u8 values")
    lab = labels.astype(np.int64)
    if lab.size and (lab.min() < 0 or lab.max() > 255):
        raise NotPackableError("labels do not fit one byte")

    xyz = np.ascontiguousarray(points[:, :3])
    rel = np.ascontiguousarray(points[:, 6:9])

    # Candidate centers: (a) the preprocessor's formula recomputed from
    # each block's own points with the identical f32 op sequence
    # (augment_points: min + B/2 on x/y, min + (max-min)/2 on z);
    # (b) derived from the first point (covers foreign preprocessors
    # whose stored center the formula doesn't reproduce).
    mins = np.minimum.reduceat(xyz, offsets, axis=0)
    maxz = np.maximum.reduceat(xyz[:, 2], offsets)
    half = np.float32(BLOCK_SIZE / 2)
    formula = np.stack(
        [mins[:, 0] + half, mins[:, 1] + half,
         mins[:, 2] + (maxz - mins[:, 2]) / 2], axis=1)
    first_point = xyz[offsets] - rel[offsets]
    rel_bits = rel.view(np.uint32)

    def blocks_ok(centers):
        got = (xyz - np.repeat(centers, counts, axis=0)).view(np.uint32)
        return np.logical_and.reduceat((got == rel_bits).all(axis=1), offsets)

    ok_formula = blocks_ok(formula)
    if ok_formula.all():
        centers = formula
    else:
        ok_first = blocks_ok(first_point)
        if not (ok_formula | ok_first).all():
            raise NotPackableError(
                "rel features are not xyz - center for any recoverable center")
        centers = np.where(ok_formula[:, None], formula, first_point)

    packed = np.empty((points.shape[0], 4), np.uint32)
    packed[:, :3] = xyz.view(np.uint32)
    r, g, b = (rgb[:, i].astype(np.uint32) for i in range(3))
    packed[:, 3] = (r << 24) | (g << 16) | (b << 8) | lab.astype(np.uint32)
    return packed, np.ascontiguousarray(centers, np.float32)


def dataset_fingerprint(dataset) -> str | None:
    """Stable content key for a `BlockDataset`'s on-disk files (path,
    size, mtime_ns) — keys the packed-store cache. None when the
    dataset does not expose its file list (in-memory datasets)."""
    import hashlib
    import os

    blocks = getattr(dataset, "blocks", None)
    data_dir = getattr(dataset, "data_dir", None)
    if blocks is None or data_dir is None:
        return None
    h = hashlib.sha256()
    for a, _i, _j, fn in blocks:
        st = os.stat(os.path.join(data_dir, f"area_{a}", fn))
        h.update(f"{a}/{fn}:{st.st_size}:{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:24]


_FP_UNSET = object()


def load_packed_cached(dataset, cache_dir: str, num_workers: int = 8,
                       raw=None, fp=_FP_UNSET, skip_read: bool = False):
    """(packed, centers, counts) for `dataset`, served from an on-disk
    cache when the dataset fingerprint matches; packs (and writes the
    cache) otherwise. The single miss-path implementation — the
    `device_store_or_host_loader` compact stage calls this too (with
    its already-loaded `raw` blocks), so cache semantics live in one
    place.

    `fp`/`skip_read` let a caller that already fingerprinted the
    dataset and missed the cache avoid repeating both (the fingerprint
    is an os.stat sweep over every block file — ~100k stats at full
    S3DIS scale; ADVICE r04 #3).

    Full-S3DIS pack is ~285 s of host work per process plus the raw
    block load before it (PIPELINE_BENCH_r03.json cold start ≈ 9.5 min
    to step 1); the cache pays it once ever. Hits return the packed
    table MEMORY-MAPPED, so restart cost is metadata + the chunked
    upload alone (VERDICT r03 item 6). Writes publish a complete
    per-fingerprint directory with one atomic rename, so a killed or
    CONCURRENT writer never leaves a usable half cache behind
    (ADVICE r04 #2)."""
    if fp is _FP_UNSET:
        fp = dataset_fingerprint(dataset)
    if not skip_read:
        cached = _read_pack_cache(cache_dir, fp)
        if cached is not None:
            return cached

    if raw is None:
        raw = _load_raw_blocks(dataset, num_workers)
    counts = np.asarray(raw[2], np.int32)
    packed, centers = pack_block_table(raw[0], raw[1], counts)
    if fp is not None:
        _write_pack_cache(cache_dir, fp, packed, centers, counts)
    return packed, centers, counts


_PACK_CACHE_NAMES = ("packed.npy", "centers.npy", "counts.npy")


def _read_pack_dir(d: str, fp: str):
    """One cache directory -> (packed mmap, centers, counts) or None.

    Validates meta.json's recorded rows/blocks against the arrays
    actually on disk (and counts.sum() against rows): a crash while
    OVERWRITING a legacy flat-layout cache can leave a fingerprint-
    matching meta next to a mix of old and new arrays, and serving
    that silently trains on wrong data (JAX clamps the out-of-range
    gathers a mismatched counts/packed pair produces — no error)."""
    import json
    import os

    meta_p = os.path.join(d, "meta.json")
    if not os.path.exists(meta_p):
        return None
    try:
        with open(meta_p) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return None
    if meta.get("fingerprint") != fp or not all(
        os.path.exists(os.path.join(d, n)) for n in _PACK_CACHE_NAMES
    ):
        return None
    packed = np.load(os.path.join(d, _PACK_CACHE_NAMES[0]), mmap_mode="r")
    centers = np.load(os.path.join(d, _PACK_CACHE_NAMES[1]))
    counts = np.load(os.path.join(d, _PACK_CACHE_NAMES[2]))
    rows, blocks = meta.get("rows"), meta.get("blocks")
    if (packed.shape[0] != rows or counts.shape[0] != blocks
            or centers.shape[0] != blocks or int(counts.sum()) != rows):
        return None
    return packed, centers, counts


def _read_pack_cache(cache_dir: str, fp: str | None):
    """Cache hit -> (packed mmap, centers, counts); None otherwise.

    Looks in the per-fingerprint subdirectory `cache_dir/{fp}` (the
    r05 layout: one atomic directory per dataset, so one cache dir can
    serve several datasets and concurrent writers can't interleave —
    ADVICE r04 #2), then falls back to the legacy flat layout written
    by earlier rounds."""
    import os

    if fp is None:
        return None
    hit = _read_pack_dir(os.path.join(cache_dir, fp), fp)
    if hit is not None:
        return hit
    return _read_pack_dir(cache_dir, fp)


def _write_pack_cache(cache_dir, fp, packed, centers, counts) -> None:
    """Publishes `cache_dir/{fp}` with ONE atomic directory rename.

    The full cache set (arrays + meta.json) is staged in a per-pid
    temp subdirectory, then renamed into place — a killed process
    leaves only an invisible temp dir, and two concurrent writers
    (same or different datasets) can't interleave per-file renames
    into a mixed cache (ADVICE r04 #2). Loser of a same-fp publish
    race discards its staging dir: same fingerprint = same input
    files = identical content. Stale temp dirs from dead writers are
    swept opportunistically."""
    import contextlib
    import json
    import os
    import shutil

    os.makedirs(cache_dir, exist_ok=True)
    pid = os.getpid()
    # sweep temp dirs left by crashed writers (best-effort)
    for entry in os.listdir(cache_dir):
        if not entry.startswith(".tmp-"):
            continue
        try:
            owner = int(entry.split("-")[1])
            os.kill(owner, 0)  # raises if the pid is gone
        except (ValueError, ProcessLookupError):
            with contextlib.suppress(OSError):
                shutil.rmtree(os.path.join(cache_dir, entry))
        except PermissionError:
            pass  # pid alive under another uid — leave it

    stage = os.path.join(cache_dir, f".tmp-{pid}")
    os.makedirs(stage, exist_ok=True)
    for name, arr in zip(_PACK_CACHE_NAMES, (packed, centers, counts)):
        np.save(os.path.join(stage, name), arr)
    with open(os.path.join(stage, "meta.json"), "w") as f:
        json.dump({"fingerprint": fp, "rows": int(packed.shape[0]),
                   "blocks": int(counts.shape[0])}, f)
    target = os.path.join(cache_dir, fp)
    try:
        os.replace(stage, target)
    except OSError:
        # target exists non-empty: either a concurrent same-fp writer
        # published identical content (keep theirs), or an invalid/
        # torn dir occupies the slot (replace it, else every future
        # read would miss and repack forever)
        if _read_pack_dir(target, fp) is None:
            with contextlib.suppress(OSError):
                shutil.rmtree(target)
            with contextlib.suppress(OSError):
                os.replace(stage, target)
                return
        with contextlib.suppress(OSError):
            shutil.rmtree(stage)


def _choose_rows(offsets, counts, order, step, key, batch_size, npoints):
    """Block choice + within-block row sampling shared by both store
    layouts. Returns (rows (B, n) flat-table indices, safe block ids,
    valid mask, next_step, next_key)."""
    key, sub = jax.random.split(key)
    ids = jax.lax.dynamic_slice(order, (step * batch_size,), (batch_size,))
    valid = ids >= 0
    safe = jnp.where(valid, ids, 0)
    off = jnp.take(offsets, safe, axis=0)          # (B,)
    cnt = jnp.where(valid, jnp.take(counts, safe, axis=0), 0)

    u = jax.random.uniform(sub, (batch_size, npoints))
    local = jnp.floor(u * cnt[:, None].astype(jnp.float32)).astype(jnp.int32)
    local = jnp.clip(local, 0, jnp.maximum(cnt[:, None] - 1, 0))
    rows = off[:, None] + local                    # (B, npoints)
    return rows, safe, valid, step + 1, key


def _finish_batch(pts, lab, valid, npoints, num_classes):
    """Fill-row masking + one-hot, shared by both layouts."""
    onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.uint8)
    # fill rows carry zero labels + zero features + zero length
    onehot = jnp.where(valid[:, None, None], onehot, 0)
    pts = jnp.where(valid[:, None, None], pts, 0.0)
    lengths = jnp.where(valid, npoints, 0).astype(jnp.int32)
    return pts, onehot, lengths


@partial(jax.jit, static_argnames=("batch_size", "npoints", "num_classes"))
def _sample_batch(
    points: jax.Array,    # (T, F) flat point table
    labels: jax.Array,    # (T,)  flat class ids
    offsets: jax.Array,   # (M,)
    counts: jax.Array,    # (M,)
    order: jax.Array,     # (M_padded,) block ids, -1 = fill row
    step: jax.Array,      # () int32 — batch index within the epoch
    key: jax.Array,
    *,
    batch_size: int,
    npoints: int,
    num_classes: int,
):
    """One sampled batch. `step` and `key` MUST be device-resident and
    threaded between calls (see DeviceEpochLoader): a fresh host scalar
    per step would cost a relayed H2D round trip (~30 ms measured,
    PROFILE_r02.json h2d) — more than the sampling itself (~4 ms)."""
    rows, _, valid, step, key = _choose_rows(
        offsets, counts, order, step, key, batch_size, npoints)
    pts = jnp.take(points, rows.reshape(-1), axis=0)
    pts = pts.reshape(batch_size, npoints, points.shape[-1])
    lab = jnp.take(labels, rows.reshape(-1), axis=0)
    lab = lab.reshape(batch_size, npoints)
    pts, onehot, lengths = _finish_batch(pts, lab, valid, npoints, num_classes)
    return pts, onehot, lengths, step, key


@partial(jax.jit, static_argnames=("batch_size", "npoints", "num_classes"))
def _sample_batch_packed(
    packed: jax.Array,    # (T, 4) u32 — see pack_blocks
    centers: jax.Array,   # (M, 3) f32 per-block centers
    offsets: jax.Array,
    counts: jax.Array,
    order: jax.Array,
    step: jax.Array,
    key: jax.Array,
    *,
    batch_size: int,
    npoints: int,
    num_classes: int,
):
    """Sampled batch from the 16-byte/point packed table.

    One 16-byte-row gather fetches everything (vs 36 B + 1 B rows for
    the flat layout — and tiny-row gathers are per-row-overhead-bound
    on this chip, CLAUDE.md round-2 findings, so FEWER gathers matter
    more than fewer bytes). Reconstruction is exact: xyz come back via
    integer bitcast (integers survive the gather path bit-for-bit —
    unlike bf16 lanes, which FTZ subnormals, AB_PACKEDGATHER_r02), rgb
    are exact u8→f32 conversions, and xyz−center recomputes the
    identical IEEE f32 subtraction the host preprocessor ran."""
    rows, safe, valid, step, key = _choose_rows(
        offsets, counts, order, step, key, batch_size, npoints)
    w = jnp.take(packed, rows.reshape(-1), axis=0)
    w = w.reshape(batch_size, npoints, 4)
    xyz = jax.lax.bitcast_convert_type(w[..., :3], jnp.float32)
    w3 = w[..., 3]
    rgb = jnp.stack(
        [(w3 >> 24) & 0xFF, (w3 >> 16) & 0xFF, (w3 >> 8) & 0xFF], axis=-1
    ).astype(jnp.float32)
    lab = (w3 & 0xFF).astype(jnp.uint8)
    ctr = jnp.take(centers, safe, axis=0)          # (B, 3)
    rel = xyz - ctr[:, None, :]
    pts = jnp.concatenate([xyz, rgb, rel], axis=-1)
    pts, onehot, lengths = _finish_batch(pts, lab, valid, npoints, num_classes)
    return pts, onehot, lengths, step, key


def _load_raw_blocks(dataset, num_workers: int):
    """Bulk-loads a `BlockDataset` (raw, unsampled blocks) once via a
    thread pool; returns the concatenated (points, labels, counts)."""
    from concurrent.futures import ThreadPoolExecutor

    if getattr(dataset, "sampling", None) is not None:
        raise ValueError(
            "device stores want raw blocks; construct the "
            "BlockDataset with sampling=None (sampling runs on device)"
        )
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        blocks = list(pool.map(dataset.__getitem__, range(len(dataset))))
    pts = np.concatenate([p for p, _ in blocks], axis=0)
    labs = np.concatenate([
        # host blocks carry one-hot labels only in collate; dataset
        # items are (points, class-id labels) or (points, onehot)
        l.argmax(-1) if l.ndim == 2 else l for _, l in blocks
    ]).astype(np.uint8)
    counts = [p.shape[0] for p, _ in blocks]
    return pts, labs, counts


class _DeviceStoreBase:
    """Shared store machinery: subclasses set `_tables` (the positional
    prefix of their jitted `_sampler` / unjitted `_raw_sampler`),
    `counts`, and `num_classes`."""

    _sampler: staticmethod
    _raw_sampler: staticmethod

    @property
    def tables(self) -> tuple:
        return self._tables

    @property
    def num_blocks(self) -> int:
        return int(self.counts.shape[0])

    @property
    def nbytes(self) -> int:
        return sum(int(x.size) * x.dtype.itemsize for x in self._tables)

    def sample(self, order, step, key, batch_size: int, npoints: int):
        """One batch — entirely on device. Returns
        (points, onehot, lengths, next_step, next_key); thread the last
        two back into the next call (they live on device — converting
        them to/from host scalars costs a relay round trip per step)."""
        return type(self)._sampler(
            *self._tables, order, step, key,
            batch_size=batch_size, npoints=npoints,
            num_classes=self.num_classes,
        )

    def epoch_order(self, key, batch_size: int) -> jax.Array:
        """Random block permutation for one epoch, padded with -1 fill
        ids to a multiple of batch_size (device-side shuffle — the
        analogue of the reference DataLoader's shuffle=True)."""
        m = self.num_blocks
        perm = jax.random.permutation(key, m)
        pad = (-m) % batch_size
        if pad:
            perm = jnp.concatenate([perm, jnp.full((pad,), -1, perm.dtype)])
        return perm.astype(jnp.int32)

    @classmethod
    def from_block_dataset(cls, dataset, num_classes: int = NUM_S3DIS_CLASSES,
                           num_workers: int = 8, sharding=None):
        pts, labs, counts = _load_raw_blocks(dataset, num_workers)
        return cls(pts, labs, counts, num_classes, sharding=sharding)


class DeviceBlockStore(_DeviceStoreBase):
    """The whole block split, resident in HBM as flat f32, with jitted
    sampling (36 B + 1 B per point)."""

    _sampler = staticmethod(_sample_batch)
    _raw_sampler = staticmethod(_sample_batch.__wrapped__)

    def __init__(
        self,
        points: np.ndarray | jax.Array,
        labels: np.ndarray | jax.Array,
        counts: np.ndarray | Sequence[int],
        num_classes: int = NUM_S3DIS_CLASSES,
        sharding=None,
    ):
        """Args:
        points: (T, F) all block points, concatenated.
        labels: (T,) integer class ids.
        counts: (M,) points per block; offsets are the exclusive cumsum.
        sharding: optional jax.sharding.Sharding for the flat tables
            (default: the backend's default single-device placement).
        """
        counts = np.asarray(counts, np.int32)
        offsets = np.zeros_like(counts)
        np.cumsum(counts[:-1], out=offsets[1:])
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self.points = put(jnp.asarray(points, jnp.float32))
        self.labels = put(jnp.asarray(labels, jnp.uint8))
        self.offsets = put(jnp.asarray(offsets))
        self.counts = put(jnp.asarray(counts))
        self.num_classes = num_classes
        self._tables = (self.points, self.labels, self.offsets, self.counts)


class CompactDeviceStore(_DeviceStoreBase):
    """The whole block split at 16 bytes/point — full S3DIS (~273M
    points) costs 4.4 GB instead of 10 GB f32, fitting HBM grants where
    the flat store cannot (the round-3 relay grant measured ~7.9 GB).
    Sampling output is BIT-IDENTICAL to `DeviceBlockStore` (verified at
    pack time, see `pack_block_table`); only the canonical S3DIS block
    format packs — `NotPackableError` otherwise."""

    _sampler = staticmethod(_sample_batch_packed)
    _raw_sampler = staticmethod(_sample_batch_packed.__wrapped__)

    def __init__(
        self,
        points: np.ndarray,
        labels: np.ndarray,
        counts: np.ndarray | Sequence[int],
        num_classes: int = NUM_S3DIS_CLASSES,
        sharding=None,
    ):
        counts = np.asarray(counts, np.int32)
        packed, centers = pack_block_table(points, labels, counts)
        self._init_from_packed(packed, centers, counts, num_classes, sharding)

    @classmethod
    def from_packed(cls, packed, centers, counts,
                    num_classes: int = NUM_S3DIS_CLASSES, sharding=None):
        """Wraps an ALREADY-packed table (host or device arrays) without
        re-verifying — for callers that packed via `pack_block_table`
        themselves, e.g. to stream the upload with `upload_flat`."""
        self = object.__new__(cls)
        self._init_from_packed(packed, centers,
                               np.asarray(counts, np.int32),
                               num_classes, sharding)
        return self

    def _init_from_packed(self, packed, centers, counts, num_classes,
                          sharding):
        offsets = np.zeros_like(counts)
        np.cumsum(counts[:-1], out=offsets[1:])
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self.packed = put(packed if isinstance(packed, jax.Array)
                          else jnp.asarray(packed))
        # centers/offsets/counts are per-BLOCK (tiny) — always replicated
        self.centers = jax.device_put(jnp.asarray(centers))
        self.offsets = jax.device_put(jnp.asarray(offsets))
        self.counts = jax.device_put(jnp.asarray(counts))
        self.num_classes = num_classes
        self._tables = (self.packed, self.centers, self.offsets, self.counts)


def upload_flat(
    arr: np.ndarray, chunk_rows: int = 16_000_000, sharding=None,
) -> jax.Array:
    """Streams a large host array to the device in row chunks.

    A single device_put of a ~10 GB table is one giant relay message
    (and one giant host buffer pin); chunked dynamic_update_slice into
    a DONATED device buffer keeps peak HBM at table + one chunk and
    gives the relay link regular synchronization points. Used by the
    full-scale store path (VERDICT round-2 item 4).
    """
    n = arr.shape[0]
    if n <= chunk_rows:
        return jax.device_put(arr, sharding)

    @partial(jax.jit, donate_argnums=(0,))
    def _update(buf, chunk, start):
        # start is a traced scalar: one executable for all full chunks
        # (+ one for the tail), not one per offset
        return jax.lax.dynamic_update_slice(
            buf, chunk, (start,) + (0,) * (arr.ndim - 1))

    buf = jnp.zeros(arr.shape, dtype=arr.dtype,
                    device=sharding) if sharding is not None else \
        jnp.zeros(arr.shape, dtype=arr.dtype)
    # two compiles max: the full chunk and the tail
    for start in range(0, n, chunk_rows):
        chunk = jax.device_put(np.ascontiguousarray(
            arr[start:start + chunk_rows]))
        buf = _update(buf, chunk, np.int32(start))
    return buf


def flat_tables_from_compact(store, chunk_rows: int = 8_000_000):
    """Reconstructs the flat f32 tables ON DEVICE from a resident
    `CompactDeviceStore`: the (T, 9) ``[xyz, rgb, xyz - center]`` table
    and the (T,) u8 labels, bit-identical to the host table the store
    was packed from (xyz return via integer bitcast, rgb are exact
    u8-valued converts, and rel re-runs the identical IEEE f32
    ``xyz - center`` subtraction — the same exactness argument as
    `_sample_batch_packed`, attested on chip in VERIFY_TPU_r03).

    Exists for the relay memory model (CLAUDE.md round-3 findings):
    client-visible device buffers freed in-process do NOT return to the
    HBM grant until process exit, so a chunked HOST upload of the flat
    table strands ~table-size bytes of dead staging chunks — uploading
    compact (4.4 GB) and then flat (10.1 GB) can never fit a 15.5 GB
    grant. Device-side unpack allocates exactly the two output tables
    and nothing else. Used by tools/bench_fullscale.py ``--layout both``
    (the same-session flat-vs-compact sampler A/B)."""
    packed, centers, offsets, counts = store._tables
    total = packed.shape[0]

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(6,))
    def _fill(pbuf, lbuf, packed, centers, offsets, start, rows):
        w = jax.lax.dynamic_slice_in_dim(packed, start, rows, 0)
        xyz = jax.lax.bitcast_convert_type(w[:, :3], jnp.float32)
        w3 = w[:, 3]
        rgb = jnp.stack([(w3 >> 24) & 0xFF, (w3 >> 16) & 0xFF,
                         (w3 >> 8) & 0xFF], axis=-1).astype(jnp.float32)
        lab = (w3 & 0xFF).astype(jnp.uint8)
        idx = start + jnp.arange(rows, dtype=jnp.int32)
        blk = jnp.searchsorted(offsets, idx, side="right") - 1
        ctr = jnp.take(centers, blk, axis=0)
        pts = jnp.concatenate([xyz, rgb, xyz - ctr], axis=-1)
        pbuf = jax.lax.dynamic_update_slice(pbuf, pts, (start, 0))
        lbuf = jax.lax.dynamic_update_slice(lbuf, lab, (start,))
        return pbuf, lbuf

    # big buffer first: when the grant is short, the OOM lands on pbuf
    # with nothing else allocated, so callers can retry without
    # stranding a dropped handle (relay frees only land at process
    # exit); lbuf is a 2.7% rider that fits whenever pbuf does
    pbuf = jnp.zeros((total, 9), jnp.float32)
    lbuf = jnp.zeros((total,), jnp.uint8)
    main = (total // chunk_rows) * chunk_rows
    # two executables max (full chunk + tail), like upload_flat
    for start in range(0, main, chunk_rows):
        pbuf, lbuf = _fill(pbuf, lbuf, packed, centers, offsets,
                           jnp.int32(start), chunk_rows)
    if main < total:
        pbuf, lbuf = _fill(pbuf, lbuf, packed, centers, offsets,
                           jnp.int32(main), total - main)
    return pbuf, lbuf


def hbm_bytes_limit() -> int | None:
    """The accelerator's memory capacity, when the backend reports it."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_limit")) if stats else None
    except Exception:
        return None


def device_store_or_host_loader(
    dataset,
    batch_size: int,
    npoints: int = 4096,
    num_classes: int = NUM_S3DIS_CLASSES,
    seed: int = 0,
    *,
    model_workspace_bytes: int = 5 << 30,
    hbm_limit: int | None = None,
    store_bytes_estimate: int | None = None,
    chunk: int = 8,
    num_workers: int = 8,
    layout: str = "auto",
    pack_cache: str | None = None,
):
    """The training-input policy: flat device store when it fits, the
    16-byte/point compact store when only that fits (full S3DIS is
    10 GB flat vs 4.4 GB packed — the difference between fitting and
    not fitting the measured ~7.9 GB relay HBM grant), chunked host
    prefetcher when neither does (VERDICT round-2 item 4).

    The store must leave room for the model's step temporaries
    (DGCNN's measured worst case is ~4.8 GB at B=8/N=4096/k=20 —
    `model_workspace_bytes` defaults above it), so the budget is
    hbm_limit − workspace. When `store_bytes_estimate` is given (the
    FLAT store's bytes; callers that know their dataset size can skip
    a doomed upload), an over-budget layout is skipped without an
    upload attempt; otherwise each store is attempted and an
    allocation failure (or a NotPackableError for the compact layout)
    falls through to the next stage.

    `layout` forces a stage: "flat" / "compact" / "host" skip the
    others entirely (a forced device layout still falls back to host on
    OOM / NotPackableError); "auto" (default) walks the chain.

    `pack_cache` names a directory persisting the PACKED table keyed by
    the dataset fingerprint (VERDICT r03 item 6): a hit skips the raw
    block load AND the ~285 s full-scale pack — restart cost becomes
    metadata + the chunked upload; a miss packs once and writes it.
    Setting it also opts auto mode into COMPACT-FIRST (see `order`
    below): only the compact stage packs, so flat-first would leave the
    cache permanently unwritten on sessions where flat fits. A
    non-packable dataset (float rgb) still falls back flat -> host.

    Returns (loader, mode) with mode in {"device", "compact", "host"}.
    """
    from pointseg.runtime import is_oom_error

    if layout not in ("auto", "flat", "compact", "host"):
        raise ValueError(f"layout must be auto/flat/compact/host, got {layout}")
    limit = hbm_limit if hbm_limit is not None else hbm_bytes_limit()

    def fits(est):
        return not (est is not None and limit is not None
                    and est + model_workspace_bytes > limit)

    # flat layout: 36 B points + 1 B label; compact: 16 B packed
    compact_estimate = None if store_bytes_estimate is None else \
        (store_bytes_estimate * 16) // 37
    raw = None
    fp_key = dataset_fingerprint(dataset) if pack_cache is not None else None
    cached = _read_pack_cache(pack_cache, fp_key) if pack_cache else None

    def actual_estimate(name):
        """Store bytes derived from the loaded arrays (or the pack
        cache's metadata) — used in auto mode when the caller gave no
        estimate, so a doomed full-scale upload is SKIPPED rather than
        attempted and rolled back (on the relay an OOM'd buffer is
        never returned to the grant within the process — CLAUDE.md
        round-3 relay-memory findings)."""
        if raw is not None:
            pts, _labs, counts = raw
            t, f, m = int(pts.shape[0]), int(pts.shape[1]), len(counts)
        else:  # cache hit: T rows of 16 B packed / T*37 flat
            packed, centers, counts = cached
            t, f, m = int(packed.shape[0]), 9, int(counts.shape[0])
        if name == "flat":
            return t * f * 4 + t  # f32 points + u8 labels
        return t * 16 + m * 12  # packed u32x4 + per-block meta

    def have_estimate():
        return raw is not None or cached is not None

    stages = {
        "flat": (DeviceBlockStore, store_bytes_estimate, "device"),
        "compact": (CompactDeviceStore, compact_estimate, "compact"),
    }
    # Requesting a pack cache opts auto mode into COMPACT-FIRST: on a
    # hit the cache skips the raw block load + ~285 s full-scale pack
    # entirely, and on a miss only the compact stage packs (and thus
    # writes the cache) — flat-first would leave `pack_cache` inert
    # forever on sessions where flat fits, re-paying the raw load the
    # flag promises to skip. Compact is the right store to prefer
    # anyway: equal-throughput (AB_FLAT_COMPACT_r04.json), bit-identical
    # sampling, 2.3x fewer uploaded bytes.
    order = ((("compact", "flat") if pack_cache is not None
              else ("flat", "compact")) if layout == "auto"
             else (layout,) if layout in stages else ())
    reasons: list[str] = []
    if layout == "auto" and pack_cache is not None:
        reasons.append(
            "pack-cache " + ("hit" if cached is not None else "miss")
            + ": compact preferred over flat (equal-throughput, "
              "AB_FLAT_COMPACT_r04)")
    for name in order:
        cls, est, mode = stages[name]
        if layout == "auto" and not fits(est):
            reasons.append(f"{name}: over budget (caller estimate)")
            continue
        try:
            if layout == "auto" and est is None and have_estimate() and \
                    not fits(actual_estimate(name)):
                reasons.append(f"{name}: over budget (measured "
                               f"{actual_estimate(name) / 1e9:.2f} GB)")
                continue
            if name == "compact" and pack_cache is not None:
                if cached is None:
                    if raw is None:
                        raw = _load_raw_blocks(dataset, num_workers)
                        if layout == "auto" and est is None and \
                                not fits(actual_estimate(name)):
                            reasons.append(
                                f"{name}: over budget (measured "
                                f"{actual_estimate(name) / 1e9:.2f} GB)")
                            continue
                    # fp_key was computed and the cache read-missed at
                    # function entry — don't repeat either (the
                    # fingerprint is a ~100k-file stat sweep at scale)
                    packed, centers, counts_arr = load_packed_cached(
                        dataset, pack_cache, num_workers, raw=raw,
                        fp=fp_key, skip_read=True)
                else:
                    packed, centers, counts_arr = cached
                # big tables stream in row chunks (one giant relay
                # message otherwise); mmap'd cache hits never fully
                # materialize on the host
                table = (upload_flat(packed)
                         if packed.nbytes > (1 << 30) else packed)
                store = CompactDeviceStore.from_packed(
                    table, centers, counts_arr, num_classes=num_classes)
            else:
                if raw is None:
                    raw = _load_raw_blocks(dataset, num_workers)
                    if layout == "auto" and est is None and \
                            not fits(actual_estimate(name)):
                        reasons.append(f"{name}: over budget (measured "
                                       f"{actual_estimate(name) / 1e9:.2f} GB)")
                        continue
                store = cls(*raw, num_classes=num_classes)
            loader = DeviceEpochLoader(store, batch_size, npoints, seed=seed)
            loader.policy_reason = "; ".join(reasons) or f"{name} fits"
            return loader, mode
        except NotPackableError as e:
            reasons.append(f"{name}: not packable ({e})")
        except Exception as e:  # noqa: BLE001 — only OOM falls back
            if not is_oom_error(e):
                raise
            reasons.append(f"{name}: device OOM")
    import copy

    from pointseg.data.datasets import Loader

    # the device store wants raw blocks (sampling=None); the host path
    # samples on the host exactly like the reference loader
    sampled = copy.copy(dataset)
    if hasattr(sampled, "sampling"):
        sampled.sampling = npoints
    host = Loader(sampled, batch_size=batch_size, shuffle=True,
                  pad_to=npoints, num_classes=num_classes, seed=seed,
                  num_workers=num_workers)
    prefetcher = ChunkedDevicePrefetcher(host, chunk=chunk)
    prefetcher.policy_reason = "; ".join(reasons) or "host layout forced"
    return prefetcher, "host"


class ChunkedDevicePrefetcher:
    """Amortizes host->device transfer latency for host loaders.

    On the relayed TPU runtime one batch transfer costs ~30 ms of
    round-trip latency regardless of size (PROFILE_r02.json h2d) — more
    than the 4096-point train step itself, capping the host pipeline at
    ~40% of step throughput no matter how many reader threads run. This
    wrapper stacks `chunk` equal-shaped batches on the host (in a
    background thread, overlapped with device compute) and ships them
    as ONE transfer, then yields per-batch device slices: latency is
    paid once per chunk instead of once per step.

    Batches whose shapes differ from the running chunk (bucketed eval
    pads, short final batches) flush the chunk and start a new one, so
    any (points, labels, lengths) loader can be wrapped.
    """

    def __init__(self, loader, chunk: int = 8, prefetch: int = 2):
        self.loader = loader
        self.chunk = chunk
        self.prefetch = prefetch

    def __len__(self) -> int:
        return len(self.loader)

    def _host_chunks(self):
        buf: list = []
        for batch in self.loader:
            if buf and any(
                b.shape != p.shape for b, p in zip(batch, buf[-1])
            ):
                yield [np.stack(arrs) for arrs in zip(*buf)]
                buf = []
            buf.append(batch)
            if len(buf) == self.chunk:
                yield [np.stack(arrs) for arrs in zip(*buf)]
                buf = []
        if buf:
            yield [np.stack(arrs) for arrs in zip(*buf)]

    def __iter__(self):
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        err: list = []

        def worker():
            try:
                chunks = self._host_chunks()
                try:
                    for c in chunks:
                        # bounded put: an abandoned consumer must not
                        # strand this thread on a full queue forever
                        while not stop.is_set():
                            try:
                                q.put(c, timeout=0.1)
                                break
                            except queue.Full:
                                continue
                        if stop.is_set():
                            return
                finally:
                    chunks.close()  # unwind the inner loader promptly
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                # the sentinel MUST reach a live consumer: a full queue
                # here can simply mean the consumer is still draining
                # (short epochs fill prefetch before the first get), so
                # keep trying until delivered or the consumer abandoned
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                stacked = [jax.device_put(a) for a in item]  # ONE transfer each
                for i in range(item[0].shape[0]):
                    yield tuple(a[i] for a in stacked)
            t.join()
            if err:
                raise err[0]
        finally:
            stop.set()


@partial(
    jax.jit,
    static_argnames=("sampler", "batch_size", "npoints", "num_classes",
                     "n_steps"),
    donate_argnums=(1,),
)
def _sample_train_scan(
    tables,                               # store tables (NOT donated)
    state,                                # TrainState (donated)
    order, step, key, rng,
    *,
    sampler,
    batch_size: int,
    npoints: int,
    num_classes: int,
    n_steps: int,
):
    """`n_steps` of (sample batch -> train step) fused into ONE program.

    The sampler body is the store's `_raw_sampler` (flat or packed
    layout) and the step body is `train_step` — the same computations
    the sequential DeviceEpochLoader + train_epoch path runs, threaded
    through a `lax.scan` carry instead of 2 host dispatches per step. On
    a dispatch-bound host (relay latency, or a single-core CPU driving
    the device) this is the difference between host-limited and
    device-limited training throughput.
    """
    from pointseg.train.state import train_step

    def body(carry, _):
        st, stp, k = carry
        pts, onehot, lengths, stp, k = sampler(
            *tables, order, stp, k,
            batch_size=batch_size, npoints=npoints, num_classes=num_classes,
        )
        st, m = train_step.__wrapped__(st, pts, onehot, lengths, rng)
        return (st, stp, k), m

    (state, step, key), ms = jax.lax.scan(
        body, (state, step, key), None, length=n_steps)
    return state, step, key, ms


class DeviceEpochLoader:
    """Iterable adapter: plugs the device store into the existing
    `train_epoch` loop (which accepts any iterable of
    (points, labels, lengths)) with zero host I/O per step."""

    def __init__(self, store: DeviceBlockStore, batch_size: int,
                 npoints: int = 4096, seed: int = 0, drop_last: bool = False):
        self.store = store
        self.batch_size = batch_size
        self.npoints = npoints
        self.drop_last = drop_last
        self._key = jax.random.key(seed)
        self._epoch = 0

    def __len__(self) -> int:
        m = self.store.num_blocks
        if self.drop_last:
            return m // self.batch_size
        return (m + self.batch_size - 1) // self.batch_size

    def _epoch_start(self):
        # one host->device interaction per EPOCH (the fold_in); the
        # per-step loop only chains device-resident computations
        ek = jax.random.fold_in(self._key, self._epoch)
        self._epoch += 1
        shuffle_key, key = jax.random.split(ek)
        order = self.store.epoch_order(shuffle_key, self.batch_size)
        return order, jnp.zeros((), jnp.int32), key

    def __iter__(self):
        order, step, key = self._epoch_start()
        for _ in range(len(self)):
            pts, onehot, lengths, step, key = self.store.sample(
                order, step, key, self.batch_size, self.npoints,
            )
            yield pts, onehot, lengths

    def scan_epoch(self, state, rng, scan_steps: int):
        """One epoch with (sample -> step) fused `scan_steps` at a time
        (`_sample_train_scan`): ceil(len/K) dispatches instead of
        len(self) — same batch sequence, same rng streams as __iter__ +
        sequential train_step (the remainder after the full chunks runs
        through the identical scan program with n_steps=remainder).

        Returns (state, metrics) with metrics a dict of
        (num_steps,) device arrays (loss/accuracy/miou per step)."""
        s = self.store
        order, step, key = self._epoch_start()
        total = len(self)
        chunks = []
        done = 0
        while done < total:
            k = min(scan_steps, total - done)
            state, step, key, ms = _sample_train_scan(
                s.tables, state, order, step, key, rng,
                sampler=type(s)._raw_sampler,
                batch_size=self.batch_size, npoints=self.npoints,
                num_classes=s.num_classes, n_steps=k,
            )
            chunks.append(ms)
            done += k
        metrics = {
            name: jnp.concatenate([c[name] for c in chunks])
            for name in chunks[0]
        } if chunks else {}
        return state, metrics
