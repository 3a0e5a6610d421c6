"""XJTU-SY bearing offline preprocessing.

Reproduces the reference contract (Data_Process/Data_read_XJTU_SY.py:10-169):
  - 3 conditions x 5 bearings; RUL-in-minutes table
  - each minute csv contributes the Horizontal_vibration_signals column
    (optionally downsampled); label = (endMinutes - i) / endMinutes
  - leave-one-bearing-out: for each test bearing i, train = other 4
  - per-position MinMax by the train split; offline shuffle (seeded here)
  - artifacts saved per Condition_i/Testing_bearing_j/
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .io import save_processed
from .. import native

RUL_CONDITION_BEARING = [[123, 161, 158, 122, 52],
                         [491, 161, 533, 42, 339],
                         [2538, 2496, 371, 1515, 114]]
CONDITION_FOLDERS = ["35Hz12kN", "37.5Hz11kN", "40Hz10kN"]


def _read_bearing(folder: str, minutes: int, downsampling: int) -> np.ndarray:
    paths = [os.path.join(folder, f"{i}.csv") for i in range(1, minutes + 1)]
    # Native fast path: each minute file is (32768, 2) with a one-line
    # header; column 0 is Horizontal_vibration_signals
    # (Data_read_XJTU_SY.py:66). Parallel C++ parse, pandas fallback.
    try:
        first = pd.read_csv(paths[0])
        col = list(first.columns).index("Horizontal_vibration_signals")
        stacked = native.read_tables_stacked(
            paths, first.shape[0], first.shape[1], skip_rows=1,
            dtype=np.float64)
        return stacked[:, ::downsampling, col]
    except (ValueError, KeyError):
        rows = []
        for p in paths:
            # round_trip parsing = correctly-rounded doubles, matching the
            # native strtod path bit-for-bit on arbitrary-length mantissas
            # (pandas' default precise_xstrtod is not correctly rounded).
            df = pd.read_csv(p, float_precision="round_trip")
            rows.append(
                df["Horizontal_vibration_signals"].values[::downsampling])
        return np.stack(rows)


def preprocess_xjtu_sy(data_root: str, condition_no: int,
                       downsampling: int = 1,
                       out_dir: str = "Processed_dataset", seed: int = 0):
    base = os.path.join(data_root, "XJTU-SY_Bearing_Datasets",
                        CONDITION_FOLDERS[condition_no - 1])
    ruls = RUL_CONDITION_BEARING[condition_no - 1]

    x, y = {}, {}
    for b in range(1, 6):
        minutes = ruls[b - 1]
        folder = os.path.join(base, f"Bearing{condition_no}_{b}")
        x[b] = _read_bearing(folder, minutes, downsampling)
        y[b] = np.asarray([(minutes - i) / minutes
                           for i in range(1, minutes + 1)], dtype=np.float64)

    results = {}
    rng = np.random.default_rng(seed)
    for test_b in range(1, 6):
        train_x = np.concatenate([x[b] for b in x if b != test_b], axis=0)
        train_y = np.concatenate([y[b] for b in y if b != test_b], axis=0)
        test_x = x[test_b]
        test_y = y[test_b]

        mn = train_x.min(axis=0)
        scale = train_x.max(axis=0) - mn
        train_x = (train_x - mn) / scale
        test_x = (test_x - mn) / scale

        perm = rng.permutation(train_x.shape[0])
        train_x, train_y = train_x[perm], train_y[perm]

        out = os.path.join(out_dir, "XJTU_SY", f"Condition_{condition_no}",
                           f"Testing_bearing_{test_b}")
        max_rul = float(ruls[test_b - 1])
        save_processed(out, "train", train_x.astype(np.float32),
                       train_y.astype(np.float32), max_rul)
        save_processed(out, "test", test_x.astype(np.float32),
                       test_y.astype(np.float32), max_rul)
        results[test_b] = dict(train_x=train_x, train_y=train_y,
                               test_x=test_x, test_y=test_y, max_rul=max_rul)
    return results
