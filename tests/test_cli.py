"""CLI smoke tests (subprocess, CPU platform)."""

import json
import os
import subprocess
import sys

from pointseg.runtime import host_cache_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    # JAX_PLATFORMS alone is NOT enough: the hosting sitecustomize
    # re-pins it before user code runs; POINTSEG_PLATFORM routes through
    # jax.config.update in pointseg.runtime.setup_runtime.
    JAX_PLATFORMS="cpu",
    POINTSEG_PLATFORM="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    POINTSEG_COMPILE_CACHE=host_cache_dir("/tmp/jax_cache"),
)


def _run(args, timeout=560):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, cwd=REPO, env=ENV,
    )


def test_train_help():
    out = _run(["train.py", "--help"])
    assert out.returncode == 0
    assert "PointNet++" in out.stdout


def test_cli_subcommands_listed():
    out = _run(["-m", "pointseg", "--help"])
    assert out.returncode == 0
    for sub in ["train", "prepare", "evaluate", "benchmark", "train-legacy",
                "import-torch", "doctor"]:
        assert sub in out.stdout


def test_doctor():
    out = _run(["-m", "pointseg", "doctor"])
    assert out.returncode == 0, out.stderr
    for line in ["devices:", "pallas kernels:", "gather-backward strategy:",
                 "native ETL parser:", "compile cache:"]:
        assert line in out.stdout


def test_unknown_model_rejected():
    out = _run(["train.py", "NotAModel"])
    assert out.returncode != 0
    assert "invalid choice" in out.stderr


def test_train_and_evaluate_roundtrip(tmp_path):
    """Full CLI roundtrip on tiny synthetic data: train 1 epoch,
    checkpoint, evaluate from the checkpoint."""
    data = str(tmp_path / "blocks")
    out = _run([
        "train.py", "PointNet", "--synthetic", "--data-dir", data,
        "--epochs", "1", "--train-batch-size", "2", "--train-sampling", "128",
        "--test-pad-to", "4096", "--log-interval", "5",
        "--log-dir", str(tmp_path / "runs"), "--model-dir", str(tmp_path / "ckpts"),
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Epoch 1 completed" in out.stdout

    ckpts = [
        os.path.join(tmp_path / "ckpts" / "PointNet", d)
        for d in os.listdir(tmp_path / "ckpts" / "PointNet")
    ]
    assert ckpts
    results = str(tmp_path / "results.json")
    out = _run([
        "-m", "pointseg", "evaluate", "--model-path", ckpts[0],
        "--data-path", data, "--model", "PointNet",
        "--sampling", "128", "--batch-size", "2",
        "--save-results", results,
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    with open(results) as f:
        r = json.load(f)
    assert 0 <= r["accuracy"] <= 1 and "ious" in r


def test_train_device_data_policy(tmp_path):
    """--device-data routes through the flat->compact->host policy
    (device.py::device_store_or_host_loader) and trains end-to-end."""
    data = str(tmp_path / "blocks")
    out = _run([
        "train.py", "PointNet", "--synthetic", "--data-dir", data,
        "--device-data", "--epochs", "1", "--train-batch-size", "2",
        "--train-sampling", "128", "--test-pad-to", "4096",
        "--log-dir", str(tmp_path / "runs"),
        "--model-dir", str(tmp_path / "ckpts"),
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Device-resident train split (device)" in out.stdout
    assert "Epoch 1 completed" in out.stdout


def test_prepare_pipeline(tmp_path):
    """prepare --stage all over a synthetic raw annotation tree."""
    raw = tmp_path / "raw" / "Area_1" / "office_1" / "Annotations"
    raw.mkdir(parents=True)
    import numpy as np

    rng = np.random.default_rng(0)
    for name in ["ceiling_1.txt", "floor_1.txt", "wall_1.txt"]:
        pts = rng.uniform(0, 2, size=(800, 3))
        rgb = rng.uniform(0, 255, size=(800, 3))
        rows = np.concatenate([pts, rgb], axis=1)
        (raw / name).write_text(
            "\n".join(" ".join(f"{v:.4f}" for v in r) for r in rows)
        )
    out = _run([
        "-m", "pointseg", "prepare",
        "--input-path", str(tmp_path / "raw"),
        "--areas-path", str(tmp_path / "areas"),
        "--chunked-path", str(tmp_path / "chunks"),
        "--blocks-path", str(tmp_path / "blocks"),
        "--n-chunks", "2",
    ])
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "areas" / "s3dis1.npz").exists()
    assert (tmp_path / "chunks" / "chunked_index.json").exists()
    assert (tmp_path / "blocks" / "block_to_coords_mapping.json").exists()
    blocks = list((tmp_path / "blocks" / "area_1").glob("*.npz"))
    assert blocks, "no blocks produced"
