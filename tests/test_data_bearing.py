"""End-to-end contract tests for the PHM2012 / XJTU-SY offline
preprocessors on synthetic raw trees (no real data in the container).

Checks the reference contracts (Data_Process/Data_read_PHM2012.py:10-143,
Data_read_XJTU_SY.py:10-169): per-file row extraction, label recurrences,
train-fit MinMax applied to test, dict-keyed test sets, and that the
native C++ parse path and the pandas fallback agree bit-for-bit.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gnn_rul_tpu import native
from gnn_rul_tpu.data import phm2012, xjtu_sy


@pytest.fixture
def phm_tree(tmp_path):
    """Condition-3 tree: 2 train bearings, 1 test bearing, tiny files."""
    rng = np.random.default_rng(0)
    base = tmp_path / "PHM_2012_Bearing_Datasets"
    counts = {"Bearing3_1": 5, "Bearing3_2": 4, "Bearing3_3": 3}
    raw = {}
    for split, names in [("Learning_set", ["Bearing3_1", "Bearing3_2"]),
                         ("Test_set", ["Bearing3_3"])]:
        for name in names:
            d = base / split / name
            d.mkdir(parents=True)
            rows = []
            for i in range(counts[name]):
                mat = rng.normal(size=(16, 6))
                np.savetxt(d / f"acc_{i:05d}.csv", mat, fmt="%.8f",
                           delimiter=",")
                rows.append(mat[:, 4])
            raw[name] = np.stack(rows)
    return str(tmp_path), raw, counts


def test_phm2012_contract(phm_tree, tmp_path):
    root, raw, counts = phm_tree
    out = phm2012.preprocess_phm2012(root, 3, out_dir=str(tmp_path / "o"))

    # Labels: (#files - idx + rul_last)/max; Bearing3_3 has rul_last=82.
    n = counts["Bearing3_3"]
    lab = np.asarray([n - i + 82 for i in range(n)], np.float64)
    np.testing.assert_allclose(out["test_y"]["Bearing3_3"], lab / lab.max())
    assert out["max_rul"]["Bearing3_3"] == lab.max()

    # MinMax fitted on the two train bearings, applied to test.
    train_raw = np.concatenate([raw["Bearing3_1"], raw["Bearing3_2"]])
    mn, mx = train_raw.min(0), train_raw.max(0)
    expect = (raw["Bearing3_3"] - mn) / (mx - mn)
    np.testing.assert_allclose(out["test_x"]["Bearing3_3"], expect,
                               rtol=1e-5)

    # Train rows are a permutation of the normalized train rows.
    got = np.sort(out["train_x"], axis=0)
    want = np.sort((train_raw - mn) / (mx - mn), axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # Artifacts written per split.
    cond = tmp_path / "o" / "PHM2012" / "Condition_3"
    assert (cond / "train.npz").exists() or any(cond.iterdir())


def test_phm2012_native_vs_fallback(phm_tree, monkeypatch):
    root, _, _ = phm_tree
    path = os.path.join(root, "PHM_2012_Bearing_Datasets", "Learning_set",
                        "Bearing3_1")
    fast = phm2012._read_bearing(path)
    monkeypatch.setattr(native, "_load", lambda: None)
    slow = phm2012._read_bearing(path)
    # Bit-exact in float64: the native parse uses strtod, same as pandas.
    assert fast.dtype == np.float64
    assert np.array_equal(fast, np.asarray(slow, np.float64))


@pytest.fixture
def xjtu_tree(tmp_path, monkeypatch):
    """Condition-1 tree with shrunken per-bearing minute counts."""
    rng = np.random.default_rng(1)
    monkeypatch.setattr(xjtu_sy, "RUL_CONDITION_BEARING",
                        [[4, 3, 5, 2, 3], [1] * 5, [1] * 5])
    base = tmp_path / "XJTU-SY_Bearing_Datasets" / "35Hz12kN"
    raw = {}
    for b in range(1, 6):
        minutes = xjtu_sy.RUL_CONDITION_BEARING[0][b - 1]
        d = base / f"Bearing1_{b}"
        d.mkdir(parents=True)
        rows = []
        for i in range(1, minutes + 1):
            mat = rng.normal(size=(32, 2))
            with open(d / f"{i}.csv", "w") as f:
                f.write("Horizontal_vibration_signals,"
                        "Vertical_vibration_signals\n")
                np.savetxt(f, mat, fmt="%.8f", delimiter=",")
            rows.append(mat[:, 0])
        raw[b] = np.stack(rows)
    return str(tmp_path), raw


def test_xjtu_sy_contract(xjtu_tree, tmp_path):
    root, raw = xjtu_tree
    res = xjtu_sy.preprocess_xjtu_sy(root, 1, out_dir=str(tmp_path / "o"))

    assert set(res) == {1, 2, 3, 4, 5}
    for test_b, r in res.items():
        minutes = xjtu_sy.RUL_CONDITION_BEARING[0][test_b - 1]
        # Labels: (end - i)/end for i=1..end.
        lab = np.asarray([(minutes - i) / minutes
                          for i in range(1, minutes + 1)])
        np.testing.assert_allclose(r["test_y"], lab)
        # Leave-one-bearing-out MinMax fitted on the other four.
        train_raw = np.concatenate(
            [raw[b] for b in raw if b != test_b])
        mn = train_raw.min(0)
        sc = train_raw.max(0) - mn
        np.testing.assert_allclose(
            r["test_x"], (raw[test_b] - mn) / sc, rtol=1e-5)
        assert r["train_x"].shape[0] == train_raw.shape[0]


def test_xjtu_native_vs_fallback(xjtu_tree, monkeypatch):
    root, _ = xjtu_tree
    folder = os.path.join(root, "XJTU-SY_Bearing_Datasets", "35Hz12kN",
                          "Bearing1_1")
    fast = xjtu_sy._read_bearing(folder, 4, 1)
    ds = xjtu_sy._read_bearing(folder, 4, 2)
    monkeypatch.setattr(native, "_load", lambda: None)
    slow = xjtu_sy._read_bearing(folder, 4, 1)
    assert fast.dtype == np.float64
    assert np.array_equal(fast, np.asarray(slow, np.float64))
    # Downsampling slices after the parse.
    assert ds.shape == (4, 16)
    assert np.array_equal(ds, fast[:, ::2])
