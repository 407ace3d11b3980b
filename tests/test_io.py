"""Checkpoint/IO edge cases and dispatch-override behavior."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointseg.io.checkpoint import (
    latest_checkpoint,
    load_config,
    restore_train_state,
    save_checkpoint,
)
from pointseg.models import PointNetSeg
from pointseg.ops.dispatch import set_use_pallas, use_pallas
from pointseg.runtime import is_oom_error, oom_advice
from pointseg.train.state import create_train_state


def test_latest_checkpoint_empty_dir(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    assert latest_checkpoint(str(tmp_path / "missing")) is None


def test_restore_missing_raises(tmp_path):
    model = PointNetSeg(num_classes=3)
    state = create_train_state(model, jnp.zeros((2, 16, 9)))
    with pytest.raises(FileNotFoundError):
        restore_train_state(str(tmp_path), state)


def test_load_config_missing(tmp_path):
    assert load_config(str(tmp_path)) is None


def test_save_checkpoint_atomic_no_tmp_left(tmp_path):
    model = PointNetSeg(num_classes=3)
    state = create_train_state(model, jnp.zeros((2, 16, 9)))
    save_checkpoint(str(tmp_path), state, config={"a": 1})
    files = os.listdir(tmp_path)
    assert not any(f.endswith(".tmp") for f in files)
    assert "config.json" in files


def test_checkpoint_across_model_mismatch_fails_loudly(tmp_path):
    a = create_train_state(PointNetSeg(num_classes=3), jnp.zeros((2, 16, 9)))
    save_checkpoint(str(tmp_path), a)
    b = create_train_state(PointNetSeg(num_classes=5), jnp.zeros((2, 16, 9)))
    with pytest.raises(Exception):
        restore_train_state(str(tmp_path), b)


def test_dispatch_env_override(monkeypatch):
    set_use_pallas(None)
    monkeypatch.setenv("POINTSEG_PALLAS", "0")
    assert use_pallas() is False
    monkeypatch.setenv("POINTSEG_PALLAS", "1")
    assert use_pallas() is True
    monkeypatch.delenv("POINTSEG_PALLAS")
    set_use_pallas(True)
    assert use_pallas() is True
    set_use_pallas(None)


def test_oom_helpers():
    assert "batch size" in oom_advice(batch_size=8)
    assert is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: Out of memory"))
    assert not is_oom_error(ValueError("shape mismatch"))
