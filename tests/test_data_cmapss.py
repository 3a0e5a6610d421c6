"""CMAPSS preprocessing golden test: tiny synthetic raw files through BOTH
our preprocessor and the mounted reference implementation must agree."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gnn_rul_tpu.data.cmapss import preprocess_cmapss


def _write_raw(tmp_path, n_train_engines=3, n_test_engines=2, seed=0):
    rng = np.random.default_rng(seed)
    base = os.path.join(tmp_path, "CMAPSSData")
    os.makedirs(base, exist_ok=True)

    def gen(engines, min_len, max_len):
        rows = []
        lengths = []
        for eid in range(1, engines + 1):
            n = int(rng.integers(min_len, max_len))
            lengths.append(n)
            for cyc in range(1, n + 1):
                settings = [rng.choice([0.0, 10.0, 20.0]),
                            rng.uniform(), rng.uniform()]
                sensors = rng.uniform(size=21)
                rows.append([eid, cyc] + settings + list(sensors))
        return rows, lengths

    def save(rows, path):
        with open(path, "w") as f:
            for r in rows:
                # id/cycle are integers in the raw files; trailing spaces
                # reproduce the format (two NaN columns appear with sep=" ")
                cells = [str(int(r[0])), str(int(r[1]))] + [
                    f"{v:.6f}" for v in r[2:]]
                f.write(" ".join(cells) + "  \n")

    train_rows, _ = gen(n_train_engines, 60, 90)
    test_rows, test_lens = gen(n_test_engines, 40, 80)
    save(train_rows, os.path.join(base, "train_FD001.txt"))
    save(test_rows, os.path.join(base, "test_FD001.txt"))
    residuals = rng.integers(10, 50, size=n_test_engines)
    with open(os.path.join(base, "RUL_FD001.txt"), "w") as f:
        for r in residuals:
            f.write(f"{r} \n")
    return tmp_path


def test_cmapss_contract_shapes(tmp_path):
    root = _write_raw(str(tmp_path))
    out = preprocess_cmapss(root, "FD001", max_rul=125, seq_len=50,
                            out_dir=os.path.join(str(tmp_path), "out"))
    # windows per engine = len - 49; labels in [0, 1]
    assert out["train_x"].ndim == 3
    assert out["train_x"].shape[1:] == (50, 14)
    assert out["test_x"].shape == (2, 50, 14)
    assert out["train_y"].min() >= 0 and out["train_y"].max() <= 1
    # normalized sensors within [0, 1] + transform slack on test
    assert out["train_x"].min() >= -1e-6 and out["train_x"].max() <= 1 + 1e-6


def test_cmapss_matches_reference(tmp_path, monkeypatch):
    """Run the mounted reference CMAPSS preprocessor on the same raw files
    and compare arrays exactly."""
    torch = pytest.importorskip("torch")
    root = _write_raw(str(tmp_path))

    ours = preprocess_cmapss(root, "FD001", max_rul=125, seq_len=50,
                             out_dir=os.path.join(str(tmp_path), "ours"))

    monkeypatch.chdir(str(tmp_path))  # reference saves relative to cwd
    sys.path.insert(0, "/root/reference/Data_Process")
    try:
        from Data_read_CMAPSS import CMAPSS as RefCMAPSS
        ref = RefCMAPSS(str(tmp_path), data_set="FD001", max_rul=125,
                        seq_len=50)
    finally:
        sys.path.remove("/root/reference/Data_Process")

    ref_train_x = np.array(ref.train_x, dtype=np.float32)
    ref_train_y = np.array(ref.train_y, dtype=np.float32).reshape(-1)
    ref_test_x = np.array(ref.test_x, dtype=np.float32)
    ref_test_y = np.array(ref.test_y, dtype=np.float32).reshape(-1)

    np.testing.assert_allclose(ours["train_x"], ref_train_x, atol=1e-5)
    np.testing.assert_allclose(ours["train_y"].reshape(-1), ref_train_y,
                               atol=1e-6)
    np.testing.assert_allclose(ours["test_x"], ref_test_x, atol=1e-5)
    np.testing.assert_allclose(ours["test_y"].reshape(-1), ref_test_y,
                               atol=1e-6)
