import numpy as np
import pytest

from pointseg.data import native
from pointseg.data.prepare import _parse_annotation_file


def _python_parse(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 6:
                continue
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                continue
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 6), np.float32)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_python(lib, tmp_path):
    p = tmp_path / "chair_1.txt"
    p.write_text(
        "1.5 2.25 -0.5 10 20 30\n"
        "0.0 0.0 0.0 0 0 0\n"
        "bad line\n"
        "1 2 3 4 5\n"            # 5 fields -> dropped
        "1 2 3 4 5 6 7\n"        # 7 fields -> dropped
        "1e-3 -2.5E2 3.0 4 5 6\n"
        "nanx 1 2 3 4 5\n"       # unparseable token -> dropped
    )
    got = native.parse_annotation_file(str(p))
    want = _python_parse(str(p))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (3, 6)


def test_native_empty_file(lib, tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    got = native.parse_annotation_file(str(p))
    assert got.shape == (0, 6)


def test_native_no_trailing_newline(lib, tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("1 2 3 4 5 6")
    got = native.parse_annotation_file(str(p))
    assert got.shape == (1, 6)


def test_parse_annotation_dispatches(lib, tmp_path, rng):
    """The ETL entry point uses the native parser and agrees with the
    python fallback on random data."""
    vals = rng.normal(size=(500, 6)).astype(np.float32)
    p = tmp_path / "big.txt"
    p.write_text("\n".join(" ".join(f"{v:.6f}" for v in row) for row in vals))
    got = _parse_annotation_file(str(p))
    np.testing.assert_allclose(got, _python_parse(str(p)), rtol=1e-6)
    assert got.shape == (500, 6)


def test_native_speed(lib, tmp_path, rng):
    import time

    vals = rng.normal(size=(50000, 6)).astype(np.float32)
    p = tmp_path / "big.txt"
    p.write_text("\n".join(" ".join(f"{v:.6f}" for v in row) for row in vals))

    t0 = time.perf_counter()
    native.parse_annotation_file(str(p))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _python_parse(str(p))
    t_py = time.perf_counter() - t0
    # the native parser must actually be faster (usually 20-60x)
    assert t_native < t_py, (t_native, t_py)
