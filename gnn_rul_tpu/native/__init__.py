"""ctypes bindings for the native data-pipeline runtime.

The C++ library (native/src/gnnrul_native.cpp) accelerates the host-side
half of the framework — text-table parsing and sliding-window extraction
used by the offline preprocessors (reference: Data_Process/*.py, which do
this with pandas + Python loops). Every entry point has a pure-numpy
fallback with identical semantics, so the package works without a
toolchain; `available()` reports which path is active.

Parsing parity: the C++ parser uses strtod (correctly rounded, same as
Python float()) then casts to float32 — bit-identical to np.loadtxt.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgnnrul_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "src", "gnnrul_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        # Serialize concurrent first-use builds (e.g. multiprocessing data
        # prep on a fresh checkout) with an flock; the Makefile additionally
        # compiles to a temp name and atomically renames, so even without
        # the lock a reader never CDLLs a half-written .so.
        lock_path = os.path.join(_NATIVE_DIR, ".build.lock")
        with open(lock_path, "w") as lock_f:
            try:
                import fcntl
                fcntl.flock(lock_f, fcntl.LOCK_EX)
            except ImportError:  # non-POSIX: fall back to unserialized make
                pass
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GNNRUL_NO_NATIVE"):
        return None
    # Always run make first: the Makefile's mtime rule makes this a no-op
    # when the .so is fresh, and it guarantees we never CDLL a stale or
    # foreign-host binary that happens to be lying around. The .so is not
    # version-controlled (see native/.gitignore).
    if not _build():
        # Make the silent performance cliff visible once per process.
        import warnings
        warnings.warn("gnn_rul_tpu.native: C++ build unavailable; using "
                      "the (slower) numpy fallback parsers", RuntimeWarning)
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        i64 = ctypes.c_int64
        f32p = ctypes.POINTER(ctypes.c_float)
        if lib.gnnrul_abi_version() != 1:
            return None
        lib.gnnrul_parse_table.restype = f32p
        lib.gnnrul_parse_table.argtypes = [ctypes.c_char_p,
                                           ctypes.POINTER(i64),
                                           ctypes.POINTER(i64)]
        lib.gnnrul_free.restype = None
        lib.gnnrul_free.argtypes = [f32p]
        lib.gnnrul_parse_tables_stacked.restype = i64
        lib.gnnrul_parse_tables_stacked.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, i64, i64, i64, f32p]
        lib.gnnrul_parse_tables_stacked_f64.restype = i64
        lib.gnnrul_parse_tables_stacked_f64.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), i64, i64, i64, i64,
            ctypes.POINTER(ctypes.c_double)]
        lib.gnnrul_sliding_windows.restype = i64
        lib.gnnrul_sliding_windows.argtypes = [f32p, i64, i64, i64, i64,
                                               f32p]
        lib.gnnrul_window_series.restype = i64
        lib.gnnrul_window_series.argtypes = [
            f32p, f32p, ctypes.POINTER(i64), i64, i64, i64, f32p, f32p]
    except (OSError, AttributeError):
        # Unloadable or symbol-incomplete library: numpy fallback.
        return None
    _lib = lib
    return _lib


def available() -> bool:
    """True when the C++ fast path is loaded (builds it on first call)."""
    return _load() is not None


def read_table(path: str) -> np.ndarray:
    """Parse a whitespace/comma-separated numeric file -> (rows, cols)
    float32. Native when available, else np.loadtxt."""
    lib = _load()
    if lib is None:
        # Match the native separator set (spaces/tabs/commas/semicolons),
        # same normalization as read_tables_stacked's fallback, so toggling
        # GNNRUL_NO_NATIVE never changes which inputs parse.
        with open(path, "r") as f:
            text = f.read().replace(",", " ").replace(";", " ")
        return np.loadtxt(text.splitlines(), dtype=np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    ptr = lib.gnnrul_parse_table(path.encode(), ctypes.byref(rows),
                                 ctypes.byref(cols))
    if not ptr:
        raise ValueError(f"native parse failed for {path}")
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(rows.value, cols.value))
        return arr.copy()
    finally:
        lib.gnnrul_free(ptr)


def read_tables_stacked(paths: Sequence[str], rows: int, cols: int,
                        skip_rows: int = 0,
                        dtype=np.float32) -> np.ndarray:
    """Parse many equally-shaped files into one (n, rows, cols) block —
    OpenMP-parallel natively (the PHM2012/XJTU-SY per-snapshot CSV
    pattern, thousands of small files). dtype float32 matches np.loadtxt;
    float64 matches pandas/Python float parsing exactly (use it when the
    caller normalizes in double before its final float32 cast)."""
    dtype = np.dtype(dtype)
    assert dtype in (np.float32, np.float64)
    lib = _load()
    if lib is None:
        out = np.empty((len(paths), rows, cols), dtype)
        for i, p in enumerate(paths):
            # Match the native separator set (spaces/tabs/commas/
            # semicolons): normalize to whitespace, then loadtxt with the
            # default any-whitespace delimiter so toggling GNNRUL_NO_NATIVE
            # never changes which inputs parse.
            with open(p, "r") as f:
                text = f.read().replace(",", " ").replace(";", " ")
            t = np.loadtxt(text.splitlines()[skip_rows:], dtype=dtype)
            t = t.reshape(-1, cols)
            if t.shape[0] != rows:
                raise ValueError(f"{p}: expected {rows} rows, got "
                                 f"{t.shape[0]}")
            out[i] = t
        return out
    out = np.empty((len(paths), rows, cols), dtype)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if dtype == np.float32:
        status = lib.gnnrul_parse_tables_stacked(
            arr, len(paths), skip_rows, rows, cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    else:
        status = lib.gnnrul_parse_tables_stacked_f64(
            arr, len(paths), skip_rows, rows, cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if status:
        raise ValueError(f"native parse failed for {paths[status - 1]}")
    return out


def sliding_windows(data: np.ndarray, win: int,
                    stride: int = 1) -> np.ndarray:
    """All stride-`stride` windows of length `win` from (n, d) ->
    (num_windows, win, d) float32, contiguous (a real copy, matching the
    preprocessors' output layout)."""
    data = np.ascontiguousarray(data, np.float32)
    n, d = data.shape
    if n < win:
        raise ValueError(f"series length {n} < window {win}")
    num = (n - win) // stride + 1
    lib = _load()
    if lib is None:
        idx = np.arange(0, num * stride, stride)[:, None] + np.arange(win)
        return data[idx]
    out = np.empty((num, win, d), np.float32)
    got = lib.gnnrul_sliding_windows(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, d, win,
        stride, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert got == num
    return out


def window_series(series: List[np.ndarray], labels: List[np.ndarray],
                  win: int):
    """Stride-1 window every series, label = value at each window's last
    row; series shorter than `win` are skipped (reference train-path rule,
    Data_read_CMAPSS.py:150-200). Returns (x, y) with x (W, win, d) and
    y (W, 1) float32."""
    assert len(series) == len(labels)
    d = series[0].shape[1]
    lens = np.asarray([s.shape[0] for s in series], np.int64)
    total = int(np.sum(np.maximum(lens - win + 1, 0)))
    lib = _load()
    if lib is None:
        xs, ys = [], []
        for s, lab in zip(series, labels):
            if s.shape[0] < win:
                continue
            xs.append(sliding_windows(s, win))
            ys.append(np.asarray(lab, np.float32)[win - 1:])
        x = np.concatenate(xs) if xs else np.empty((0, win, d), np.float32)
        y = (np.concatenate(ys) if ys else np.empty((0,), np.float32))
        return x, y.reshape(-1, 1)
    data = np.ascontiguousarray(np.concatenate(series), np.float32)
    labs = np.ascontiguousarray(
        np.concatenate([np.asarray(v, np.float32).reshape(-1)
                        for v in labels]), np.float32)
    assert labs.shape[0] == data.shape[0]
    out_x = np.empty((total, win, d), np.float32)
    out_y = np.empty((total,), np.float32)
    got = lib.gnnrul_window_series(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(series), d, win,
        out_x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert got == total
    return out_x, out_y.reshape(-1, 1)
