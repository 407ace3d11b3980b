import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.data import synthetic
from pointseg.data.datasets import create_chunked_dataloaders
from pointseg.data.s3dis import S3DIS_CLASSES
from pointseg.models import PointNetSeg
from pointseg.train.legacy import (
    preprocess_batch_to_train_format,
    train_model as legacy_train,
)
from pointseg.train.state import create_train_state


def _rooms(rng, lengths, D=6):
    xs = [rng.normal(size=(n, D)).astype(np.float32) for n in lengths]
    classes = S3DIS_CLASSES[:5]
    ys = [[classes[int(c)] for c in rng.integers(0, 5, n)] for n in lengths]
    return xs, ys, classes


def test_preprocess_pads_and_onehots(rng):
    xs, ys, mapping = _rooms(rng, [10, 25])
    pts, labels, lengths, cont = preprocess_batch_to_train_format(
        xs, ys, mapping, pad_multiple=16
    )
    assert cont
    assert pts.shape == (2, 32, 6)  # max 25 -> padded to 32
    assert labels.shape == (2, 32, 5)
    np.testing.assert_array_equal(lengths, [10, 25])
    # one-hot correctness for a spot sample
    assert labels[0, 0, mapping.index(ys[0][0])] == 1.0
    assert labels[0, 10:].sum() == 0  # padding rows zero


def test_preprocess_cut_truncates(rng):
    xs, ys, mapping = _rooms(rng, [50, 80])
    pts, labels, lengths, _ = preprocess_batch_to_train_format(
        xs, ys, mapping, cut=32, pad_multiple=16
    )
    assert pts.shape[1] == 32
    np.testing.assert_array_equal(lengths, [32, 32])


def test_preprocess_sampling_fraction(rng):
    xs, ys, mapping = _rooms(rng, [100])
    np_rng = np.random.default_rng(0)
    pts, labels, lengths, cont = preprocess_batch_to_train_format(
        xs, ys, mapping, sampling=0.25, rng=np_rng, pad_multiple=1
    )
    assert lengths[0] == 25
    assert not cont  # B == 1 -> skip (reference train_model.py:169)


def test_preprocess_validates(rng):
    xs, ys, mapping = _rooms(rng, [10])
    with pytest.raises(ValueError, match="sampling"):
        preprocess_batch_to_train_format(xs, ys, mapping, sampling=1.5)
    with pytest.raises(ValueError, match="mapping"):
        preprocess_batch_to_train_format(xs, [["notalabel"] * 10], mapping)


def test_legacy_training_runs(tmp_path):
    data_dir = synthetic.make_chunked_dataset(
        str(tmp_path / "chunks"), rooms_per_area=2, points_per_room=400
    )
    train_loader, test_loader = create_chunked_dataloaders(data_dir, batch_size=2)
    model = PointNetSeg(num_classes=14, in_dim=6)
    state = create_train_state(model, jnp.zeros((2, 512, 6)))
    state, records = legacy_train(
        state,
        train_loader,
        test_loader,
        S3DIS_CLASSES,
        epochs=1,
        cut=512,
        sampling=0.9,
        records_dir=str(tmp_path / "hist"),
        records_filename="run",
    )
    assert len(records["train_loss"]) == 1
    assert records["val_acc"][0] is not None
    assert (tmp_path / "hist" / "run.json").exists()
