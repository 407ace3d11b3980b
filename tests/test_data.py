import json
import os

import numpy as np
import pytest

from pointseg.data import blocks as B
from pointseg.data import synthetic
from pointseg.data.datasets import (
    BlockDataset,
    ChunkedRoomDataset,
    RoomDataset,
    Loader,
    collate_blocks,
    create_block_dataloaders,
    create_chunked_dataloaders,
)
from pointseg.data.prepare import (
    load_room_archive,
    precompute_chunk_index,
    prepare_s3dis,
    split_chunks,
)
from pointseg.data.s3dis import S3DIS_CLASSES


# ---------------------------------------------------------------- ETL

def test_prepare_s3dis_from_raw_txt(tmp_path):
    """Full raw->archive path with a synthetic annotation tree."""
    raw = tmp_path / "raw"
    ann = raw / "Area_1" / "office_1" / "Annotations"
    ann.mkdir(parents=True)
    (ann / "chair_1.txt").write_text("0.0 0.0 0.0 10 20 30\n1.0 1.0 1.0 40 50 60\n")
    (ann / "floor_1.txt").write_text("2.0 2.0 0.0 1 2 3\nbad line\n")
    (ann / ".DS_Store").write_text("junk")
    out = tmp_path / "areas"
    vocab = prepare_s3dis(str(raw), str(out), verbose=False)
    assert vocab == ["chair", "floor"]
    rooms, classes = load_room_archive(str(out / "s3dis1.npz"))
    assert classes == vocab
    assert len(rooms) == 1
    assert rooms[0]["points"].shape == (3, 6)  # malformed line dropped
    np.testing.assert_array_equal(rooms[0]["labels"], [0, 0, 1])


def test_split_chunks_and_index(tmp_path):
    rng = np.random.default_rng(0)
    areas = tmp_path / "areas"
    areas.mkdir()
    from pointseg.data.prepare import save_room_archive
    rooms = [synthetic.make_room(rng, 50) for _ in range(5)]
    save_room_archive(str(areas / "s3dis1.npz"), rooms, S3DIS_CLASSES)
    chunked = tmp_path / "chunked"
    split_chunks(str(areas), str(chunked), n_chunks=2, verbose=False)
    # ceil(5/2)=3 rooms in chunk1, 2 in chunk2
    r1, _ = load_room_archive(str(chunked / "s3dis1_chunk1.npz"))
    r2, _ = load_room_archive(str(chunked / "s3dis1_chunk2.npz"))
    assert len(r1) == 3 and len(r2) == 2

    idx_path = precompute_chunk_index(str(chunked), verbose=False)
    with open(idx_path) as f:
        idx = json.load(f)
    assert len(idx["index_mapping"]) == 5
    # idempotent without force
    precompute_chunk_index(str(chunked), verbose=False)


def test_block_grid_math():
    """Exact parity with get_block_coords (preprocess_dataset.py:42-61)."""
    x = np.array([0.0, 2.5])
    y = np.array([0.0, 1.0])
    xs, ys = B.get_block_starts(x, y)
    # span 2.5 -> ceil 3 -> offset 0.25 each side -> starts -0.25, 0.75, 1.75
    np.testing.assert_allclose(xs, [-0.25, 0.75, 1.75])
    # span 1.0 -> offset 0 -> starts 0.0 only (arange(0, 1, 1))
    np.testing.assert_allclose(ys, [0.0])


def test_augment_points_center():
    pts = np.array(
        [[0.2, 0.3, 0.0, 1, 2, 3], [0.8, 0.9, 2.0, 4, 5, 6]], np.float32
    )
    out = B.augment_points(pts)
    assert out.shape == (2, 9)
    center = np.array([0.2 + 0.5, 0.3 + 0.5, 1.0])
    np.testing.assert_allclose(out[:, 6:], pts[:, :3] - center, atol=1e-6)


def test_preprocess_blocks_skips_small(tmp_path):
    out = synthetic.make_block_dataset(
        str(tmp_path / "blocks"), areas=(1,), rooms_per_area=1, points_per_room=3000
    )
    files = []
    for root, _, fns in os.walk(out):
        files += [f for f in fns if f.endswith(".npz") and "block" in f]
    assert files, "no block files produced"
    # every produced block respects the 100-point floor and 9/14 layout
    ds = BlockDataset(out, {1})
    for i in range(len(ds)):
        p, l = ds[i]
        assert p.shape[0] >= 100
        assert p.shape[1] == 9 and l.shape[1] == 14
        assert l.sum(1).max() == 1


# ------------------------------------------------------- block loaders

@pytest.fixture(scope="module")
def block_dir(tmp_path_factory):
    return synthetic.make_block_dataset(
        str(tmp_path_factory.mktemp("blocks")),
        rooms_per_area=1,
        points_per_room=1500,
    )


def test_block_dataset_sampling(block_dir):
    ds = BlockDataset(block_dir, {1}, sampling=256)
    p, l = ds[0]
    assert p.shape == (256, 9) and l.shape == (256, 14)


def test_block_dataset_sampling_with_replacement(block_dir):
    ds = BlockDataset(block_dir, {1}, sampling=100000)  # > any block
    p, _ = ds[0]
    assert p.shape[0] == 100000  # randint with replacement


def test_block_dataset_validates_areas(block_dir):
    with pytest.raises(ValueError):
        BlockDataset(block_dir, {0, 7})
    with pytest.raises(FileNotFoundError):
        BlockDataset("/nonexistent", {1})


def test_collate_static_shapes():
    batch = [
        (np.ones((100, 9), np.float32), np.ones((100, 14), np.uint8)),
        (np.ones((300, 9), np.float32), np.ones((300, 14), np.uint8)),
    ]
    p, l, n = collate_blocks(batch, pad_to=512, batch_size=4)
    assert p.shape == (4, 512, 9) and l.shape == (4, 512, 14)
    np.testing.assert_array_equal(n, [100, 300, 0, 0])
    assert p[0, 100:].sum() == 0 and l[1, 300:].sum() == 0

    # bucketed: max 300 -> bucket 384
    p, _, _ = collate_blocks(batch, buckets=[128, 384, 1024])
    assert p.shape[1] == 384

    # multiple-of rounding default
    p, _, _ = collate_blocks(batch)
    assert p.shape[1] == 512

    with pytest.raises(ValueError):
        collate_blocks(batch, pad_to=128)


def test_loader_prefetch_and_shapes(block_dir):
    ds = BlockDataset(block_dir, {1, 2}, sampling=256)
    loader = Loader(ds, batch_size=3, shuffle=True, pad_to=256, prefetch=2)
    seen = 0
    for p, l, n in loader:
        assert p.shape == (3, 256, 9)
        assert (n[: min(3, len(ds) - seen)] == 256).all()
        seen += 3
    assert seen >= len(ds)


def test_loader_propagates_worker_errors(block_dir):
    class Broken:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(Loader(Broken(), batch_size=2, prefetch=1))


def test_create_block_dataloaders(block_dir):
    train, test = create_block_dataloaders(
        block_dir, test_areas={6}, train_batch_size=2, test_batch_size=2,
        train_sampling=128, test_buckets=[1024, 2048],
    )
    p, l, n = next(iter(train))
    assert p.shape == (2, 128, 9)
    p, l, n = next(iter(test))
    assert p.shape[1] in (1024, 2048)


# ------------------------------------------------------ chunked stack

@pytest.fixture(scope="module")
def chunk_dir(tmp_path_factory):
    return synthetic.make_chunked_dataset(
        str(tmp_path_factory.mktemp("chunks")), rooms_per_area=2, points_per_room=300
    )


def test_chunked_dataset_with_index(chunk_dir):
    ds = ChunkedRoomDataset(chunk_dir, [1, 2])
    assert len(ds) == 4
    sample = ds[0]
    assert sample["x"].shape[1] == 6
    assert isinstance(sample["y"][0], str)
    assert sample["area"] == 1


def test_chunked_dataset_on_the_fly(chunk_dir, tmp_path):
    # copy without index
    import shutil
    d = tmp_path / "noindex"
    shutil.copytree(chunk_dir, d)
    os.remove(d / "chunked_index.json")
    with pytest.raises(FileNotFoundError):
        ChunkedRoomDataset(str(d), [1])
    ds = ChunkedRoomDataset(str(d), [1], require_index_file=False)
    assert len(ds) == 2


def test_chunked_dataloaders_list_collate(chunk_dir):
    train, test = create_chunked_dataloaders(chunk_dir, batch_size=2)
    batch = next(iter(train))
    assert isinstance(batch["x"], list) and len(batch["x"]) == 2
    assert isinstance(batch["y"][0][0], str)
    assert len(train.dataset) == 10 and len(test.dataset) == 2


# ---------------------- reference .pt room/chunk archive compatibility

def _write_ref_pt_archive(path, n_rooms, rng, classes=("wall", "floor", "chair")):
    """Reference-format room archive: torch pickle of {'x', 'y'} dicts
    (reference data_processing/datasets.py:104-123)."""
    torch = pytest.importorskip("torch")
    rooms = []
    for _ in range(n_rooms):
        n = int(rng.integers(50, 80))
        rooms.append({
            "x": torch.tensor(rng.normal(size=(n, 6)).astype("float32")),
            "y": [classes[int(c)] for c in rng.integers(0, len(classes), n)],
        })
    with open(path, "wb") as f:
        torch.save(rooms, f)
    return rooms


def test_room_dataset_reads_reference_pt(tmp_path, rng):
    d = tmp_path / "ptrooms"
    d.mkdir()
    rooms = _write_ref_pt_archive(d / "s3dis1.pt", 3, rng)
    ds = RoomDataset(str(d), [1], use_cached_index=False)
    assert len(ds) == 3
    item = ds[1]
    np.testing.assert_allclose(item["x"], rooms[1]["x"].numpy())
    assert item["y"] == rooms[1]["y"]
    assert item["area"] == 1


def test_chunked_dataset_reads_reference_pt_with_pkl_index(tmp_path, rng):
    import pickle

    d = tmp_path / "ptchunks"
    d.mkdir()
    r1 = _write_ref_pt_archive(d / "s3dis1_chunk001.pt", 2, rng)
    r2 = _write_ref_pt_archive(d / "s3dis2_chunk001.pt", 1, rng)
    # the reference's precomputed pickle index (chunked_datasets.py:55)
    with open(d / "chunked_s3dis_index_mapping.pkl", "wb") as f:
        pickle.dump({
            "chunk_files": ["some\\dir\\s3dis1_chunk001.pt",
                            "some\\dir\\s3dis2_chunk001.pt"],
            "index_mapping": [(0, 0), (0, 1), (1, 0)],
        }, f)

    ds = ChunkedRoomDataset(str(d))
    assert len(ds) == 3
    np.testing.assert_allclose(ds[1]["x"], r1[1]["x"].numpy())
    assert ds[2]["y"] == r2[0]["y"]
    assert ds[2]["area"] == 2

    # area filter honors the pkl index remap
    ds1 = ChunkedRoomDataset(str(d), [2])
    assert len(ds1) == 1 and ds1[0]["area"] == 2


def test_chunked_dataset_on_the_fly_pt(tmp_path, rng):
    d = tmp_path / "ptfly"
    d.mkdir()
    _write_ref_pt_archive(d / "s3dis1_chunk001.pt", 2, rng)
    ds = ChunkedRoomDataset(str(d), [1], require_index_file=False)
    assert len(ds) == 2
    assert isinstance(ds[0]["y"][0], str)


def test_abandoned_loader_reaps_threads(tmp_path, rng):
    """Breaking out of a Loader mid-epoch (benchmarks, early stop) must
    not strand the prefetch thread on a full queue or leave reader-pool
    threads alive — leaked threads contend with the training process."""
    import threading
    import time as _time

    d = tmp_path / "area_1"
    d.mkdir()
    for i in range(40):
        pts = rng.normal(size=(64, 9)).astype(np.float32)
        labs = np.eye(14, dtype=np.uint8)[rng.integers(0, 14, 64)]
        np.savez(d / f"room1_block{i}.npz", points=pts, labels=labs)
    ds = BlockDataset(str(tmp_path), {1}, sampling=64)
    before = threading.active_count()
    for _ in range(3):  # repeated abandonment must not accumulate threads
        loader = Loader(ds, 4, prefetch=2, num_workers=4)
        for _batch in loader:
            break  # abandon with most of the epoch unread
        del loader, _batch
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_collate_repeat_pad_mode(rng):
    """pad_mode='repeat' fills padding with cyclic copies of the block's
    own points/labels; lengths still mark the real prefix."""
    batch = [
        (rng.normal(size=(100, 9)).astype(np.float32),
         np.eye(14, dtype=np.uint8)[rng.integers(0, 14, 100)]),
        (rng.normal(size=(256, 9)).astype(np.float32),
         np.eye(14, dtype=np.uint8)[rng.integers(0, 14, 256)]),
    ]
    p, l, n = collate_blocks(batch, pad_to=256, pad_mode="repeat")
    assert list(n) == [100, 256]
    # cyclic repetition: row 100+i == row i (mod 100), labels too
    for i in range(156):
        np.testing.assert_array_equal(p[0, 100 + i], p[0, i % 100])
        np.testing.assert_array_equal(l[0, 100 + i], l[0, i % 100])
    # full block untouched
    np.testing.assert_array_equal(p[1], batch[1][0])
    # zero-length fill rows stay all-zero
    p2, l2, n2 = collate_blocks(batch, pad_to=256, batch_size=3,
                                pad_mode="repeat")
    assert n2[2] == 0 and not p2[2].any() and not l2[2].any()
    with pytest.raises(ValueError):
        collate_blocks(batch, pad_to=256, pad_mode="mirror")
