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
is exactly the dataset size (S3DIS total ≈ 273M points ≈ 10 GB f32;
any area subset fits a 16 GB chip comfortably).

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

from pointseg.data.s3dis import NUM_S3DIS_CLASSES


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

    pts = jnp.take(points, rows.reshape(-1), axis=0)
    pts = pts.reshape(batch_size, npoints, points.shape[-1])
    lab = jnp.take(labels, rows.reshape(-1), axis=0)
    lab = lab.reshape(batch_size, npoints)
    onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.uint8)
    # fill rows carry zero labels + zero features + zero length
    onehot = jnp.where(valid[:, None, None], onehot, 0)
    pts = jnp.where(valid[:, None, None], pts, 0.0)
    lengths = jnp.where(valid, npoints, 0).astype(jnp.int32)
    return pts, onehot, lengths, step + 1, key


class DeviceBlockStore:
    """The whole block split, resident in HBM, with jitted sampling."""

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

    @classmethod
    def from_block_dataset(cls, dataset, num_classes: int = NUM_S3DIS_CLASSES,
                           num_workers: int = 8, sharding=None):
        """Bulk-loads a `BlockDataset` (raw, unsampled blocks) once via a
        thread pool and uploads the concatenation."""
        from concurrent.futures import ThreadPoolExecutor

        if getattr(dataset, "sampling", None) is not None:
            raise ValueError(
                "DeviceBlockStore wants raw blocks; construct the "
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
        return cls(pts, labs, counts, num_classes, sharding=sharding)

    @property
    def num_blocks(self) -> int:
        return int(self.counts.shape[0])

    @property
    def nbytes(self) -> int:
        return sum(int(x.size) * x.dtype.itemsize
                   for x in (self.points, self.labels, self.offsets, self.counts))

    def sample(self, order, step, key, batch_size: int, npoints: int):
        """One batch — entirely on device. Returns
        (points, onehot, lengths, next_step, next_key); thread the last
        two back into the next call (they live on device — converting
        them to/from host scalars costs a relay round trip per step)."""
        return _sample_batch(
            self.points, self.labels, self.offsets, self.counts,
            order, step, key,
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
):
    """The training-input policy: device store when it fits, chunked
    host prefetcher when it doesn't (VERDICT round-2 item 4).

    The store must leave room for the model's step temporaries
    (DGCNN's measured worst case is ~4.8 GB at B=8/N=4096/k=20 —
    `model_workspace_bytes` defaults above it), so the budget is
    hbm_limit − workspace. When `store_bytes_estimate` is given
    (callers that know their dataset size can skip a doomed upload),
    an over-budget store goes straight to the host path; otherwise the
    store is attempted and an allocation failure falls back.

    Returns (loader, mode) with mode in {"device", "host"}.
    """
    from pointseg.runtime import is_oom_error

    limit = hbm_limit if hbm_limit is not None else hbm_bytes_limit()
    doomed = (
        store_bytes_estimate is not None and limit is not None
        and store_bytes_estimate + model_workspace_bytes > limit
    )
    if not doomed:
        try:
            store = DeviceBlockStore.from_block_dataset(
                dataset, num_classes=num_classes, num_workers=num_workers)
            return (
                DeviceEpochLoader(store, batch_size, npoints, seed=seed),
                "device",
            )
        except Exception as e:  # noqa: BLE001 — only OOM falls back
            if not is_oom_error(e):
                raise
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
    return ChunkedDevicePrefetcher(host, chunk=chunk), "host"


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
    static_argnames=("batch_size", "npoints", "num_classes", "n_steps"),
    donate_argnums=(4,),
)
def _sample_train_scan(
    points, labels, offsets, counts,      # store tables (NOT donated)
    state,                                # TrainState (donated)
    order, step, key, rng,
    *,
    batch_size: int,
    npoints: int,
    num_classes: int,
    n_steps: int,
):
    """`n_steps` of (sample batch -> train step) fused into ONE program.

    The sampler body is `_sample_batch` and the step body is
    `train_step` — the same computations the sequential
    DeviceEpochLoader + train_epoch path runs, threaded through a
    `lax.scan` carry instead of 2 host dispatches per step. On a
    dispatch-bound host (relay latency, or a single-core CPU driving
    the device) this is the difference between host-limited and
    device-limited training throughput.
    """
    from pointseg.train.state import train_step

    def body(carry, _):
        st, stp, k = carry
        pts, onehot, lengths, stp, k = _sample_batch.__wrapped__(
            points, labels, offsets, counts, order, stp, k,
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
                s.points, s.labels, s.offsets, s.counts,
                state, order, step, key, rng,
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
