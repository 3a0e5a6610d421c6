"""Native C++ data-runtime parity: fast path vs the pure-numpy fallback.

The contract (gnn_rul_tpu/native): bit-identical float32 output between
the C++ library and np.loadtxt / numpy windowing, since parsing goes
through correctly-rounded strtod in both.
"""

import os

import numpy as np
import pytest

from gnn_rul_tpu import native


needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built")


@pytest.fixture
def table(tmp_path):
    rng = np.random.default_rng(7)
    a = rng.normal(size=(200, 26)) * np.logspace(-3, 3, 26)
    p = tmp_path / "t.txt"
    np.savetxt(p, a, fmt="%.12g")
    return str(p)


@needs_native
def test_parse_table_matches_loadtxt(table):
    ours = native.read_table(table)
    ref = np.loadtxt(table, dtype=np.float32)
    assert ours.shape == ref.shape
    assert np.array_equal(ours, ref)


@needs_native
def test_parse_table_trailing_separators(tmp_path):
    # CMAPSS txt files end lines with a trailing space (the reference
    # drops the resulting NaN columns 26/27, Data_read_CMAPSS.py:24).
    p = tmp_path / "trail.txt"
    p.write_text("1.0 2.0 3.0 \n4.0 5.0 6.0 \n")
    arr = native.read_table(str(p))
    assert arr.shape == (2, 3)
    assert np.array_equal(arr, [[1, 2, 3], [4, 5, 6]])


@needs_native
def test_parse_table_semicolon_and_missing_newline(tmp_path):
    p = tmp_path / "semi.csv"
    p.write_text("1.5;2.5\n-3.25;4e-2")
    arr = native.read_table(str(p))
    assert np.array_equal(arr, np.asarray([[1.5, 2.5], [-3.25, 0.04]],
                                          np.float32))


@needs_native
def test_ragged_table_rejected(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        native.read_table(str(p))


@needs_native
def test_stacked_parse_with_header(tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        p = tmp_path / f"f{i}.csv"
        np.savetxt(p, rng.normal(size=(32, 4)), fmt="%.8f", delimiter=",",
                   header="a,b,c,d", comments="")
        paths.append(str(p))
    out = native.read_tables_stacked(paths, 32, 4, skip_rows=1)
    for i, p in enumerate(paths):
        ref = np.loadtxt(p, dtype=np.float32, delimiter=",", skiprows=1)
        assert np.array_equal(out[i], ref)


@needs_native
def test_stacked_parse_shape_mismatch_raises(tmp_path):
    p0 = tmp_path / "a.csv"
    p1 = tmp_path / "b.csv"
    p0.write_text("1,2\n3,4\n")
    p1.write_text("1,2\n")
    with pytest.raises(ValueError):
        native.read_tables_stacked([str(p0), str(p1)], 2, 2)


def _windows_fallback(data, win, stride=1):
    num = (data.shape[0] - win) // stride + 1
    idx = np.arange(0, num * stride, stride)[:, None] + np.arange(win)
    return data[idx]


@needs_native
def test_sliding_windows_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(311, 14)).astype(np.float32)
    for win, stride in [(50, 1), (32, 4), (311, 1)]:
        ours = native.sliding_windows(x, win, stride)
        assert np.array_equal(ours, _windows_fallback(x, win, stride))


@needs_native
def test_window_series_matches_fallback(monkeypatch):
    rng = np.random.default_rng(1)
    lens = [120, 30, 77, 50]  # 30 < win: skipped, like the reference
    series = [rng.normal(size=(n, 14)).astype(np.float32) for n in lens]
    labels = [rng.normal(size=(n,)).astype(np.float32) for n in lens]
    fx, fy = native.window_series(series, labels, 50)

    monkeypatch.setattr(native, "_load", lambda: None)
    gx, gy = native.window_series(series, labels, 50)
    assert np.array_equal(fx, gx)
    assert np.array_equal(fy, gy)
    assert fx.shape == (71 + 28 + 1, 50, 14)
    assert fy.shape == (100, 1)


def test_fallback_paths_work_without_library(monkeypatch, table):
    monkeypatch.setattr(native, "_load", lambda: None)
    arr = native.read_table(table)
    assert np.array_equal(arr, np.loadtxt(table, dtype=np.float32))
    x = np.arange(40, dtype=np.float32).reshape(10, 4)
    w = native.sliding_windows(x, 3, 2)
    assert w.shape == (4, 3, 4)
    assert np.array_equal(w[1], x[2:5])
