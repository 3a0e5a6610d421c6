"""C-MAPSS offline preprocessing.

Reproduces the reference contract (Data_Process/Data_read_CMAPSS.py:18-330):
  - read train_/test_/RUL_FD00x.txt (space-separated, trailing blanks)
  - drop the 7 flat sensors s1,s5,s6,s10,s16,s18,s19 (14 remain)
  - piecewise-linear RUL cap at max_rul (125) then y /= max_rul
  - per-operating-condition MinMax scaling grouped on setting1 rounded to
    one decimal (how FD002/FD004 multi-condition is handled)
  - train: all sliding windows of length seq_len stride 1 per engine,
    label = RUL at the window END row
  - test: ONE window per engine (the last seq_len rows, head-padded with the
    first row if the engine is shorter), label = last row RUL

Output samples are (num_windows, seq_len, 14) float32 — the loader moves
channels to axis 1.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
import pandas as pd

from .io import save_processed
from .. import native

SENSOR_COLS = ["s2", "s3", "s4", "s7", "s8", "s9", "s11", "s12", "s13",
               "s14", "s15", "s17", "s20", "s21"]
_ALL_COLS = ["id", "cycle", "setting1", "setting2", "setting3"] + [
    f"s{i}" for i in range(1, 22)]
_DROP_SENSORS = ["s1", "s5", "s6", "s10", "s16", "s18", "s19"]


def _read_txt(path: str) -> pd.DataFrame:
    df = pd.read_csv(path, sep=" ", header=None)
    df = df.drop(columns=[26, 27])
    df.columns = _ALL_COLS
    return df.sort_values(["id", "cycle"])


def _per_condition_minmax(train: pd.DataFrame, test: pd.DataFrame,
                          cols) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """MinMax fit per rounded-setting1 group on train, applied to the
    matching test group (sklearn zero-range handling: scale 0 -> 1)."""
    train_out = train[cols].copy()
    test_out = test[cols].copy()
    for cond, g in train.groupby("setting1"):
        lo = g[cols].min()
        hi = g[cols].max()
        scale = (hi - lo).replace(0.0, 1.0)
        train_out.loc[g.index] = (g[cols] - lo) / scale
        tmask = test["setting1"] == cond
        if tmask.any():
            test_out.loc[tmask] = (test.loc[tmask, cols] - lo) / scale
    return train_out, test_out


def preprocess_cmapss(data_root: str, data_set: str, max_rul: int = 125,
                      seq_len: int = 50, out_dir: str = "Processed_dataset"):
    """Process one FD00x sub-dataset and write train/test artifacts."""
    base = os.path.join(data_root, "CMAPSSData")
    train_df = _read_txt(os.path.join(base, f"train_{data_set}.txt"))
    test_df = _read_txt(os.path.join(base, f"test_{data_set}.txt"))
    truth = pd.read_csv(os.path.join(base, f"RUL_{data_set}.txt"), sep=" ",
                        header=None).drop(columns=[1])

    for df in (train_df, test_df):
        df.drop(columns=_DROP_SENSORS, inplace=True)
        df["setting1"] = df["setting1"].round(1)

    # Labels: train RUL = per-engine max cycle - cycle; test adds the
    # residual-RUL truth file; both capped then normalized.
    train_max = train_df.groupby("id")["cycle"].max()
    train_y = (train_df["id"].map(train_max) - train_df["cycle"]).clip(
        upper=max_rul) / max_rul
    test_max = test_df.groupby("id")["cycle"].max()
    residual = pd.Series(truth[0].values, index=test_max.index)
    test_y = ((test_df["id"].map(test_max + residual) - test_df["cycle"])
              .clip(upper=max_rul) / max_rul)

    train_norm, test_norm = _per_condition_minmax(train_df, test_df,
                                                  SENSOR_COLS)

    # Train: all sliding windows per engine, label at window end
    # (native C++ window extractor; numpy fallback has identical
    # semantics — see gnn_rul_tpu/native).
    series, labels = [], []
    for eid, g in train_df.groupby("id"):
        series.append(train_norm.loc[g.index].values.astype(np.float32))
        labels.append(train_y.loc[g.index].values.astype(np.float32))
    train_x, train_y_arr = native.window_series(series, labels, seq_len)

    # Test: last window per engine, head-padded if short; label = last RUL.
    test_x_list, test_y_list = [], []
    for eid, g in test_df.groupby("id"):
        mat = test_norm.loc[g.index].values.astype(np.float32)
        lab = test_y.loc[g.index].values.astype(np.float32)
        n = mat.shape[0]
        if n < seq_len:
            pad = np.repeat(mat[:1], seq_len - n, axis=0)
            mat = np.concatenate([pad, mat], axis=0)
        test_x_list.append(mat[-seq_len:])
        test_y_list.append(lab[-1])
    test_x = np.stack(test_x_list)
    test_y_arr = np.asarray(test_y_list, dtype=np.float32)[:, None]

    out = os.path.join(out_dir, "CMAPSS", data_set)
    save_processed(out, "train", train_x, train_y_arr, max_rul)
    save_processed(out, "test", test_x, test_y_arr, max_rul)
    return dict(train_x=train_x, train_y=train_y_arr,
                test_x=test_x, test_y=test_y_arr, max_rul=max_rul)
