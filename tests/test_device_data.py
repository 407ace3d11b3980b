"""Device-resident block store + multi-worker host loader.

The on-HBM sampling path (pointseg/data/device.py) replaces the
reference's host DataLoader re-reads (block_datasets.py:104-181) with
jitted in-step sampling; these tests pin its semantics on the virtual
CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.data.datasets import BlockDataset, Loader
from pointseg.data.device import DeviceBlockStore, DeviceEpochLoader
from pointseg.data.synthetic import make_block_dataset


@pytest.fixture(scope="module")
def block_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blocks")
    return make_block_dataset(str(d), areas=(1, 2), rooms_per_area=2,
                              points_per_room=3000, seed=0)


def _toy_store(num_blocks=5, num_classes=4, seed=0):
    """Blocks whose feature[0] encodes the block id — any cross-block
    sampling leak is immediately visible in the features."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(50, 400, size=num_blocks)
    pts, labs = [], []
    for b, n in enumerate(counts):
        p = rng.normal(size=(n, 9)).astype(np.float32)
        p[:, 0] = b
        pts.append(p)
        labs.append(rng.integers(0, num_classes, size=n).astype(np.uint8))
    store = DeviceBlockStore(np.concatenate(pts), np.concatenate(labs),
                             counts, num_classes=num_classes)
    return store, counts


def test_sample_stays_within_block():
    store, _ = _toy_store()
    order = store.epoch_order(jax.random.key(0), batch_size=2)
    for step in range(store.num_blocks // 2):
        pts, onehot, lengths, _, _ = store.sample(
            order, step, jax.random.key(step), batch_size=2, npoints=64)
        assert pts.shape == (2, 64, 9)
        assert onehot.shape == (2, 64, 4) and onehot.dtype == jnp.uint8
        ids = np.asarray(order)[2 * step : 2 * step + 2]
        got = np.asarray(pts)[:, :, 0]
        # every sampled point carries its source block's id marker
        np.testing.assert_array_equal(got, np.broadcast_to(ids[:, None], got.shape))
        assert np.all(np.asarray(lengths) == 64)


def test_labels_match_points():
    """The (point, label) pairing survives the flat gather: rebuild the
    expected label from the sampled point's identity feature."""
    rng = np.random.default_rng(1)
    counts = [100, 200]
    pts, labs = [], []
    for b, n in enumerate(counts):
        p = rng.normal(size=(n, 9)).astype(np.float32)
        # feature[1] encodes the point's label
        lab = rng.integers(0, 4, size=n).astype(np.uint8)
        p[:, 1] = lab
        pts.append(p)
        labs.append(lab)
    store = DeviceBlockStore(np.concatenate(pts), np.concatenate(labs),
                             counts, num_classes=4)
    order = jnp.asarray([0, 1], jnp.int32)
    p, onehot, _, _, _ = store.sample(order, 0, jax.random.key(3),
                                      batch_size=2, npoints=128)
    want = np.asarray(p)[:, :, 1].astype(np.int64)
    got = np.asarray(onehot).argmax(-1)
    np.testing.assert_array_equal(got, want)


def test_fill_rows_are_zeroed():
    store, _ = _toy_store(num_blocks=3)
    order = store.epoch_order(jax.random.key(0), batch_size=2)  # padded to 4
    assert order.shape == (4,) and int(order[-1]) == -1
    pts, onehot, lengths, _, _ = store.sample(order, 1, jax.random.key(0),
                                              batch_size=2, npoints=32)
    assert int(lengths[1]) == 0
    assert np.all(np.asarray(onehot)[1] == 0)
    assert np.all(np.asarray(pts)[1] == 0)


def test_epoch_order_is_a_permutation():
    store, _ = _toy_store(num_blocks=7)
    order = np.asarray(store.epoch_order(jax.random.key(5), batch_size=4))
    assert order.shape == (8,)
    assert sorted(order[order >= 0]) == list(range(7))


def test_epoch_loader_deterministic_and_shuffled():
    store, _ = _toy_store(num_blocks=6)
    a = [np.asarray(p) for p, _, _ in DeviceEpochLoader(store, 2, 32, seed=9)]
    b = [np.asarray(p) for p, _, _ in DeviceEpochLoader(store, 2, 32, seed=9)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # successive epochs reshuffle
    ld = DeviceEpochLoader(store, 2, 32, seed=9)
    e1 = np.concatenate([np.asarray(p)[:, 0, 0] for p, _, _ in ld])
    e2 = np.concatenate([np.asarray(p)[:, 0, 0] for p, _, _ in ld])
    assert sorted(e1.tolist()) == sorted(e2.tolist())
    assert not np.array_equal(e1, e2)


def test_from_block_dataset_matches_host(block_dir):
    ds = BlockDataset(block_dir, {1, 2}, sampling=None)
    store = DeviceBlockStore.from_block_dataset(ds, num_workers=4)
    assert store.num_blocks == len(ds)
    total = sum(ds[i][0].shape[0] for i in range(len(ds)))
    assert store.points.shape == (total, 9)
    # per-block counts line up with the host reads
    for i in range(len(ds)):
        assert int(store.counts[i]) == ds[i][0].shape[0]
    assert store.nbytes > 0

    def rejects_sampled():
        DeviceBlockStore.from_block_dataset(BlockDataset(block_dir, {1}, sampling=64))

    with pytest.raises(ValueError):
        rejects_sampled()


def test_device_loader_feeds_train_step(block_dir):
    """The loader's output plugs straight into the jitted train step."""
    from pointseg.models import PointNetSeg
    from pointseg.train.state import create_train_state, train_step

    ds = BlockDataset(block_dir, {1}, sampling=None)
    store = DeviceBlockStore.from_block_dataset(ds)
    loader = DeviceEpochLoader(store, batch_size=2, npoints=256)
    model = PointNetSeg(num_classes=14)
    pts, _, _ = next(iter(loader))
    state = create_train_state(model, pts, 1e-3)
    for batch in loader:
        state, metrics = train_step(state, *batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_chunked_prefetcher_matches_loader(block_dir):
    """ChunkedDevicePrefetcher must yield exactly the wrapped loader's
    batches (content and order), across shape-change flushes (bucketed
    pads / short final batches) and chunk boundaries."""
    from pointseg.data.device import ChunkedDevicePrefetcher

    ds = BlockDataset(block_dir, {1, 2}, sampling=None)
    kw = dict(batch_size=3, shuffle=False, pad_to=None, buckets=(512, 1024, 4096),
              prefetch=0, num_workers=0)
    plain = list(Loader(ds, **kw))
    wrapped = list(ChunkedDevicePrefetcher(Loader(ds, **kw), chunk=4))
    assert len(plain) == len(wrapped)
    assert len(wrapped) == len(ChunkedDevicePrefetcher(Loader(ds, **kw)))
    for (p1, l1, n1), (p2, l2, n2) in zip(plain, wrapped):
        np.testing.assert_array_equal(p1, np.asarray(p2))
        np.testing.assert_array_equal(l1, np.asarray(l2))
        np.testing.assert_array_equal(n1, np.asarray(n2))


def test_parallel_loader_matches_serial(block_dir):
    ds = BlockDataset(block_dir, {1, 2}, sampling=None)
    kw = dict(batch_size=3, shuffle=False, pad_to=4096, prefetch=0)
    serial = list(Loader(ds, **kw, num_workers=0))
    parallel = list(Loader(ds, **kw, num_workers=4))
    assert len(serial) == len(parallel)
    for (p1, l1, n1), (p2, l2, n2) in zip(serial, parallel):
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(n1, n2)


def test_device_store_or_host_loader_fallback(block_dir):
    """The training-input policy (VERDICT round-2 item 4): device store
    when the HBM budget allows, chunked host prefetcher when it
    doesn't — and both modes feed identically-shaped batches."""
    from pointseg.data.device import device_store_or_host_loader

    ds = BlockDataset(block_dir, {1, 2}, sampling=None)

    dev_loader, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0)
    assert mode == "device"

    # a store estimate over a tiny budget must go straight to the host
    # path (no doomed upload)
    host_loader, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        hbm_limit=1 << 20, model_workspace_bytes=1 << 19,
        store_bytes_estimate=1 << 20)
    assert mode == "host"

    for loader in (dev_loader, host_loader):
        batches = list(iter(loader))
        assert len(batches) == len(loader)
        pts, onehot, lengths = batches[0]
        assert tuple(pts.shape) == (2, 128, 9)
        assert tuple(onehot.shape) == (2, 128, 14)
        assert np.asarray(lengths).shape == (2,)


def test_device_store_sharded_sampling_matches_unsharded():
    """A store whose flat tables are row-sharded over the mesh (the
    multi-chip placement for splits bigger than one chip's HBM) must
    sample the same batches as the single-device store."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointseg.parallel import create_mesh

    rng = np.random.default_rng(7)
    num_blocks, num_classes = 8, 5
    counts = rng.integers(100, 300, size=num_blocks)
    counts[0] += (-int(counts.sum())) % 8  # row axis divisible by mesh
    pts = rng.normal(size=(int(counts.sum()), 9)).astype(np.float32)
    labs = rng.integers(0, num_classes, size=pts.shape[0]).astype(np.uint8)

    mesh = create_mesh(jax.devices()[:8])
    plain = DeviceBlockStore(pts, labs, counts, num_classes=num_classes)
    sharded = DeviceBlockStore(
        pts, labs, counts, num_classes=num_classes,
        sharding=NamedSharding(mesh, P("data")))
    assert len(sharded.points.sharding.device_set) == 8

    order = plain.epoch_order(jax.random.key(3), batch_size=4)
    for step in range(2):
        a = plain.sample(order, step, jax.random.key(9), 4, 64)
        b = sharded.sample(order, step, jax.random.key(9), 4, 64)
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _canonical_blocks(num_blocks=6, seed=3, lo=80, hi=300):
    """Blocks in the exact preprocessor output format (augment_points):
    [xyz, u8 rgb, xyz - center] — the compact store's packing domain."""
    from pointseg.data.blocks import augment_points

    rng = np.random.default_rng(seed)
    counts = rng.integers(lo, hi, size=num_blocks)
    pts, labs = [], []
    for n in counts:
        raw = np.empty((n, 6), np.float32)
        raw[:, :3] = rng.uniform(0, 30, size=(n, 3))
        raw[:, 3:] = rng.integers(0, 256, size=(n, 3))
        pts.append(augment_points(raw))
        labs.append(rng.integers(0, 14, size=n).astype(np.uint8))
    return np.concatenate(pts), np.concatenate(labs), counts


def test_compact_store_bit_identical_to_flat():
    """CompactDeviceStore (16 B/point) must reproduce DeviceBlockStore's
    sampled batches BIT-for-bit: same key stream -> same rows, xyz via
    integer bitcast, exact u8 rgb, and the identical IEEE f32
    xyz - center subtraction the host preprocessor ran."""
    from pointseg.data.device import CompactDeviceStore

    pts, labs, counts = _canonical_blocks()
    flat = DeviceBlockStore(pts, labs, counts, num_classes=14)
    compact = CompactDeviceStore(pts, labs, counts, num_classes=14)
    assert compact.nbytes < flat.nbytes / 2

    order = flat.epoch_order(jax.random.key(11), batch_size=4)
    step, key = jnp.zeros((), jnp.int32), jax.random.key(7)
    cstep, ckey = step, key
    for _ in range(2):
        fp, fo, fl, step, key = flat.sample(order, step, key, 4, 64)
        cp, co, cl, cstep, ckey = compact.sample(order, cstep, ckey, 4, 64)
        np.testing.assert_array_equal(
            np.asarray(fp).view(np.uint32), np.asarray(cp).view(np.uint32))
        np.testing.assert_array_equal(np.asarray(fo), np.asarray(co))
        np.testing.assert_array_equal(np.asarray(fl), np.asarray(cl))


def test_flat_tables_from_compact_bit_exact():
    """Device-side unpack of the packed table must reproduce the host
    flat table bit-for-bit (both chunked and tail paths), so the
    --layout both A/B's flat store is the SAME data without the chunked
    host upload that strands staging in the relay grant."""
    from pointseg.data.device import CompactDeviceStore, flat_tables_from_compact

    pts, labs, counts = _canonical_blocks(num_blocks=7, seed=21)
    compact = CompactDeviceStore(pts, labs, counts, num_classes=14)
    # chunk_rows chosen to exercise >1 full chunk plus a ragged tail
    dpts, dlab = flat_tables_from_compact(compact, chunk_rows=257)
    np.testing.assert_array_equal(
        np.asarray(dpts).view(np.uint32), pts.view(np.uint32))
    np.testing.assert_array_equal(np.asarray(dlab), labs)
    # and the reconstructed tables drive a DeviceBlockStore identically
    flat = DeviceBlockStore(np.asarray(dpts), np.asarray(dlab), counts,
                            num_classes=14)
    order = flat.epoch_order(jax.random.key(5), batch_size=4)
    step, key = jnp.zeros((), jnp.int32), jax.random.key(9)
    fp, fo, fl, _, _ = flat.sample(order, step, key, 4, 64)
    cp, co, cl, _, _ = compact.sample(order, step, key, 4, 64)
    np.testing.assert_array_equal(
        np.asarray(fp).view(np.uint32), np.asarray(cp).view(np.uint32))
    np.testing.assert_array_equal(np.asarray(fo), np.asarray(co))


def test_pack_rejects_non_canonical():
    from pointseg.data.device import NotPackableError, pack_block_table

    pts, labs, counts = _canonical_blocks(num_blocks=3)
    bad_rgb = pts.copy()
    bad_rgb[:, 4] += 0.25
    with pytest.raises(NotPackableError):
        pack_block_table(bad_rgb, labs, counts)
    bad_rel = pts.copy()
    bad_rel[:, 6] *= 1.0001
    with pytest.raises(NotPackableError):
        pack_block_table(bad_rel, labs, counts)


def test_pack_first_point_center_fallback():
    """Foreign preprocessors whose center the augment formula doesn't
    reproduce still pack when rel = xyz - c holds for SOME constant c."""
    from pointseg.data.device import pack_block_table

    rng = np.random.default_rng(5)
    counts = np.array([50, 70])
    pts = []
    for n in counts:
        p = np.empty((n, 9), np.float32)
        p[:, :3] = rng.uniform(0, 10, size=(n, 3))
        p[:, 3:6] = rng.integers(0, 256, size=(n, 3))
        # half-integer centers: x - c is exact in f32 at these scales,
        # so the first-point derivation x0 - (x0 - c) recovers c exactly
        c = (rng.integers(0, 20, size=3) / 2).astype(np.float32)
        p[:, 6:9] = p[:, :3] - c
        pts.append(p)
    pts = np.concatenate(pts)
    labs = rng.integers(0, 14, size=pts.shape[0]).astype(np.uint8)
    packed, centers = pack_block_table(pts, labs, counts)
    assert packed.shape == (pts.shape[0], 4) and centers.shape == (2, 3)


def test_policy_falls_back_to_compact_store(tmp_path):
    """When the flat store busts the HBM budget but the packed one
    fits, the policy must land on mode='compact' — the full-S3DIS case
    on the measured ~7.9 GB relay grant."""
    from pointseg.data.device import device_store_or_host_loader

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=2,
                           points_per_room=3000, seed=1, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    total = sum(ds[i][0].shape[0] for i in range(len(ds)))
    flat_bytes = total * 37
    loader, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        hbm_limit=flat_bytes, model_workspace_bytes=flat_bytes // 2,
        store_bytes_estimate=flat_bytes)
    assert mode == "compact"
    pts, onehot, lengths = next(iter(loader))
    assert tuple(pts.shape) == (2, 128, 9)
    # non-u8 rgb data must skip compact and land on host at that budget
    d2 = make_block_dataset(str(tmp_path / "c"), areas=(1,), rooms_per_area=2,
                            points_per_room=3000, seed=1)
    ds2 = BlockDataset(d2, {1}, sampling=None)
    _, mode = device_store_or_host_loader(
        ds2, batch_size=2, npoints=128, num_classes=14, seed=0,
        hbm_limit=flat_bytes, model_workspace_bytes=flat_bytes // 2,
        store_bytes_estimate=flat_bytes)
    assert mode == "host"


def test_compact_store_scan_epoch_matches_sequential():
    """The fused (sample -> train step) scan runs over the packed
    layout too, matching the sequential loop exactly."""
    from pointseg.data.device import CompactDeviceStore
    from pointseg.models import PointNetSeg
    from pointseg.train.state import create_train_state, train_step

    pts, labs, counts = _canonical_blocks(num_blocks=5, seed=8)
    store = CompactDeviceStore(pts, labs, counts, num_classes=14)
    model = PointNetSeg(num_classes=14)
    rng = jax.random.key(0)

    seq_loader = DeviceEpochLoader(store, batch_size=2, npoints=64, seed=9)
    p0, _, _ = next(iter(seq_loader))
    state = create_train_state(model, p0, 1e-3)
    seq = create_train_state(model, p0, 1e-3)
    seq_losses = []
    for batch in DeviceEpochLoader(store, batch_size=2, npoints=64, seed=9):
        seq, m = train_step(seq, *batch, rng)
        seq_losses.append(float(m["loss"]))

    fused_loader = DeviceEpochLoader(store, batch_size=2, npoints=64, seed=9)
    state, ms = fused_loader.scan_epoch(state, rng, scan_steps=2)
    np.testing.assert_allclose(
        np.asarray(ms["loss"]), np.asarray(seq_losses), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        seq.params, state.params)


def test_policy_layout_override(tmp_path):
    """layout= forces a single stage: 'compact' packs (or host-falls),
    'host' skips device stores entirely, 'flat' ignores the budget."""
    from pointseg.data.device import device_store_or_host_loader

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=1,
                           points_per_room=2500, seed=2, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)

    _, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=64, num_classes=14, layout="compact")
    assert mode == "compact"
    _, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=64, num_classes=14, layout="host")
    assert mode == "host"
    # forced flat ignores a budget that would reject it
    _, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=64, num_classes=14, layout="flat",
        hbm_limit=1, model_workspace_bytes=1, store_bytes_estimate=10**9)
    assert mode == "device"
    with pytest.raises(ValueError):
        device_store_or_host_loader(ds, batch_size=2, npoints=64,
                                    num_classes=14, layout="nope")


def test_compact_store_sharded_sampling_matches_unsharded():
    """Row-sharding the packed table over the mesh (multi-chip placement
    for splits bigger than one chip's grant) must not change sampling."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pointseg.data.device import CompactDeviceStore
    from pointseg.parallel import create_mesh

    pts, labs, counts = _canonical_blocks(num_blocks=8, seed=12)
    pad = (-int(counts.sum())) % 8  # row axis divisible by mesh
    if pad:
        extra_pts, extra_labs, _ = _canonical_blocks(num_blocks=1, seed=13,
                                                     lo=pad, hi=pad + 1)
        pts = np.concatenate([pts, extra_pts])
        labs = np.concatenate([labs, extra_labs])
        counts = np.concatenate([counts, [pad]])

    mesh = create_mesh(jax.devices()[:8])
    plain = CompactDeviceStore(pts, labs, counts, num_classes=14)
    sharded = CompactDeviceStore(
        pts, labs, counts, num_classes=14,
        sharding=NamedSharding(mesh, P("data")))
    assert len(sharded.packed.sharding.device_set) == 8

    order = plain.epoch_order(jax.random.key(3), batch_size=4)
    for step in range(2):
        a = plain.sample(order, step, jax.random.key(9), 4, 64)
        b = sharded.sample(order, step, jax.random.key(9), 4, 64)
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_upload_flat_chunked_matches_device_put():
    from pointseg.data.device import upload_flat

    rng = np.random.default_rng(2)
    arr = rng.normal(size=(1000, 9)).astype(np.float32)
    out = upload_flat(arr, chunk_rows=300)  # 3 full chunks + tail
    np.testing.assert_array_equal(np.asarray(out), arr)
    lab = rng.integers(0, 14, size=1000).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(upload_flat(lab, chunk_rows=256)), lab)


def test_policy_auto_mode_measures_fit_without_caller_estimate(tmp_path):
    """ADVICE r03 (medium): with no caller store_bytes_estimate, auto
    mode must derive the fit check from the loaded arrays and SKIP a
    doomed upload (on the relay an OOM'd buffer never returns to the
    grant within the process), instead of attempting flat and rolling
    back."""
    from pointseg.data.device import device_store_or_host_loader

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=2,
                           points_per_room=3000, seed=1, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    total = sum(ds[i][0].shape[0] for i in range(len(ds)))
    flat_bytes = total * 37
    # budget admits compact but not flat; NO caller estimate
    loader, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        hbm_limit=flat_bytes, model_workspace_bytes=flat_bytes // 2)
    assert mode == "compact"
    assert "flat: over budget (measured" in loader.policy_reason
    # budget admits neither -> host, both skips recorded, no upload
    loader, mode = device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        hbm_limit=total * 8, model_workspace_bytes=total * 4)
    assert mode == "host"
    assert "flat: over budget (measured" in loader.policy_reason
    assert "compact: over budget (measured" in loader.policy_reason


def test_pack_cache_hit_skips_raw_load(tmp_path, monkeypatch):
    """VERDICT r03 item 6: the persisted pack cache. A first build with
    pack_cache= packs and writes the cache; a second process-equivalent
    call must serve the packed table from disk WITHOUT touching the raw
    block files (full S3DIS pack is ~285 s of host work per restart),
    and sample bit-identically to the uncached store."""
    import pointseg.data.device as dev

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=2,
                           points_per_room=3000, seed=1, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    cache = str(tmp_path / "pack_cache")

    loader1, mode = dev.device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        layout="compact", pack_cache=cache)
    assert mode == "compact"
    import os
    # r05 layout: one atomically-published subdirectory per fingerprint
    fp0 = dev.dataset_fingerprint(ds)
    assert os.path.exists(os.path.join(cache, fp0, "meta.json"))

    # hit path: any raw block load is a test failure
    def _boom(dataset, num_workers):
        raise AssertionError("cache hit must not load raw blocks")

    monkeypatch.setattr(dev, "_load_raw_blocks", _boom)
    loader2, mode = dev.device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        layout="compact", pack_cache=cache)
    assert mode == "compact"
    b1, b2 = next(iter(loader1)), next(iter(loader2))
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    monkeypatch.undo()

    # touching a source file invalidates the fingerprint -> repack
    fn = ds.blocks[0][3]
    p = os.path.join(d, "area_1", fn)
    os.utime(p, ns=(os.stat(p).st_atime_ns, os.stat(p).st_mtime_ns + 1))
    assert dev._read_pack_cache(cache, dev.dataset_fingerprint(ds)) is None
    loader3, mode = dev.device_store_or_host_loader(
        ds, batch_size=2, npoints=128, num_classes=14, seed=0,
        layout="compact", pack_cache=cache)
    assert mode == "compact"
    b3 = next(iter(loader3))
    for a, b in zip(b1, b3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_cache_auto_mode_skips_flat_budget(tmp_path):
    """A pack-cache hit in auto mode must go straight to the cached
    compact store WITHOUT a raw block load — even when flat would fit —
    because the hit is the whole point of the cache (skipping the raw
    load + pack), compact samples bit-identically, and the sampler is
    equal-throughput (AB_FLAT_COMPACT_r04.json)."""
    import pointseg.data.device as dev

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=2,
                           points_per_room=3000, seed=1, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    cache = str(tmp_path / "pack_cache")

    # warm the cache (forced compact, no budget)
    dev.device_store_or_host_loader(ds, batch_size=2, npoints=128,
                                    num_classes=14, layout="compact",
                                    pack_cache=cache)
    # auto mode, generous budget (flat WOULD fit), cache hit: compact is
    # chosen and the raw block files are never touched
    import unittest.mock as mock
    with mock.patch.object(dev, "_load_raw_blocks",
                           side_effect=AssertionError(
                               "cache hit must not load raw blocks")):
        loader, mode = dev.device_store_or_host_loader(
            ds, batch_size=2, npoints=128, num_classes=14, seed=0,
            pack_cache=cache)
    assert mode == "compact"
    assert "pack-cache hit" in loader.policy_reason


def test_load_packed_cached_roundtrip(tmp_path):
    """`load_packed_cached` returns identical (packed, centers, counts)
    on miss (pack) and hit (mmap read)."""
    from pointseg.data.device import load_packed_cached

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=1,
                           points_per_room=2500, seed=2, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    cache = str(tmp_path / "c")
    p1, c1, n1 = load_packed_cached(ds, cache)
    p2, c2, n2 = load_packed_cached(ds, cache)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_pack_cache_rejects_mixed_arrays(tmp_path):
    """Integrity check (defense in depth behind the atomic directory
    publish): external mutation — or a torn legacy flat-layout
    overwrite — can leave meta.json (old fingerprint, old rows) next
    to a replaced packed.npy from a DIFFERENT dataset. Serving that
    mix silently trains on wrong data (JAX clamps the out-of-range
    gathers a mismatched counts/packed pair produces), so the read
    path must treat any meta-vs-array inconsistency as a miss — and
    the writer must REPLACE an invalid published dir rather than
    deferring to it (else every future read repacks forever)."""
    import json
    import os

    import pointseg.data.device as dev

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=1,
                           points_per_room=2500, seed=2, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    cache = str(tmp_path / "c")
    dev.load_packed_cached(ds, cache)
    fp = dev.dataset_fingerprint(ds)
    fpd = os.path.join(cache, fp)
    assert dev._read_pack_cache(cache, fp) is not None

    # simulate the torn overwrite: packed.npy swapped for a different
    # dataset's (row count differs), meta/centers/counts still the old set
    packed = np.load(os.path.join(fpd, "packed.npy"))
    np.save(os.path.join(fpd, "packed.npy"), packed[:-7])
    assert dev._read_pack_cache(cache, fp) is None

    # restore rows but corrupt counts<->rows consistency
    np.save(os.path.join(fpd, "packed.npy"), packed)
    assert dev._read_pack_cache(cache, fp) is not None
    counts = np.load(os.path.join(fpd, "counts.npy"))
    counts = counts.copy()
    counts[0] += 1
    np.save(os.path.join(fpd, "counts.npy"), counts)
    assert dev._read_pack_cache(cache, fp) is None

    # a repack must REPLACE the invalid published dir, not defer to it
    dev.load_packed_cached(ds, cache)  # repair
    assert dev._read_pack_cache(cache, fp) is not None
    os.remove(os.path.join(fpd, "meta.json"))
    assert dev._read_pack_cache(cache, fp) is None
    # and a meta with the right fingerprint but wrong blocks is a miss
    dev.load_packed_cached(ds, cache)
    with open(os.path.join(fpd, "meta.json")) as f:
        meta = json.load(f)
    meta["blocks"] += 1
    with open(os.path.join(fpd, "meta.json"), "w") as f:
        json.dump(meta, f)
    assert dev._read_pack_cache(cache, fp) is None


def test_pack_cache_legacy_flat_layout_still_hits(tmp_path):
    """Caches written by pre-r05 rounds used a flat layout (arrays +
    meta.json directly in cache_dir); the read path must keep serving
    them."""
    import json
    import os

    import pointseg.data.device as dev

    d = make_block_dataset(str(tmp_path / "b"), areas=(1,), rooms_per_area=1,
                           points_per_room=2500, seed=2, rgb_u8=True)
    ds = BlockDataset(d, {1}, sampling=None)
    cache = str(tmp_path / "c")
    packed, centers, counts = dev.load_packed_cached(ds, cache)
    fp = dev.dataset_fingerprint(ds)
    # rewrite as the legacy flat layout
    import shutil
    fpd = os.path.join(cache, fp)
    for n in ("packed.npy", "centers.npy", "counts.npy", "meta.json"):
        shutil.move(os.path.join(fpd, n), os.path.join(cache, n))
    os.rmdir(fpd)
    hit = dev._read_pack_cache(cache, fp)
    assert hit is not None
    np.testing.assert_array_equal(np.asarray(hit[0]), np.asarray(packed))


def test_pack_cache_two_datasets_one_dir(tmp_path):
    """ADVICE r04 #2: two datasets sharing one cache dir must coexist
    (per-fingerprint subdirectories) — neither evicts or corrupts the
    other, and both hit on re-read."""
    import pointseg.data.device as dev

    d1 = make_block_dataset(str(tmp_path / "b1"), areas=(1,),
                            rooms_per_area=1, points_per_room=2500,
                            seed=2, rgb_u8=True)
    d2 = make_block_dataset(str(tmp_path / "b2"), areas=(1,),
                            rooms_per_area=2, points_per_room=3000,
                            seed=3, rgb_u8=True)
    ds1 = BlockDataset(d1, {1}, sampling=None)
    ds2 = BlockDataset(d2, {1}, sampling=None)
    cache = str(tmp_path / "c")
    p1, _, _ = dev.load_packed_cached(ds1, cache)
    p2, _, _ = dev.load_packed_cached(ds2, cache)
    h1 = dev._read_pack_cache(cache, dev.dataset_fingerprint(ds1))
    h2 = dev._read_pack_cache(cache, dev.dataset_fingerprint(ds2))
    assert h1 is not None and h2 is not None
    np.testing.assert_array_equal(np.asarray(h1[0]), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(h2[0]), np.asarray(p2))


def test_accum_steps_rejects_device_loader():
    """ADVICE r03 (low): gradient accumulation host-stacks batches, so
    a DeviceEpochLoader (device-resident micro-batches) must be
    rejected rather than silently round-tripped through the host."""
    from pointseg.data.device import DeviceBlockStore
    from pointseg.models import PointNetSeg
    from pointseg.train.loop import train_epoch
    from pointseg.train.state import create_train_state

    pts, labs, counts = _canonical_blocks(num_blocks=3, seed=4)
    store = DeviceBlockStore(pts, labs, counts, num_classes=14)
    loader = DeviceEpochLoader(store, batch_size=2, npoints=64, seed=0)
    model = PointNetSeg(num_classes=14)
    p0, _, _ = next(iter(loader))
    state = create_train_state(model, p0, 1e-3)
    with pytest.raises(ValueError, match="host loader"):
        train_epoch(state, loader, jax.random.key(0), None, 20, 0,
                    accum_steps=2)
