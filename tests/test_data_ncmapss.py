"""N-CMAPSS preprocessing golden test: a tiny synthetic DS02-006-style h5
file through BOTH our preprocessor and the mounted reference implementation
(Data_Process/Data_read_NCMAPSS.py) must agree."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gnn_rul_tpu.data.ncmapss import (W_VARS, XS_VARS, preprocess_ncmapss,
                                      TRAIN_UNITS, TEST_UNITS)

XV_ALL = ["T40", "P30", "P45"]  # extra col exercises the X_v[:, :2] slice
T_VARS = [f"t{i}" for i in range(4)]
A_VARS = ["unit", "cycle", "Fc", "hs"]


def _write_h5(tmp_path, rows_per_unit=44, seed=0):
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(seed)
    base = os.path.join(str(tmp_path), "N-CMAPSS")
    os.makedirs(base, exist_ok=True)

    def block(units):
        w, xs, xv, t, y, a = [], [], [], [], [], []
        for u in units:
            n = rows_per_unit + int(u) % 5  # slightly uneven lengths
            w.append(rng.normal(size=(n, len(W_VARS))))
            xs.append(rng.normal(size=(n, len(XS_VARS))))
            xv.append(rng.normal(size=(n, len(XV_ALL))))
            t.append(rng.normal(size=(n, len(T_VARS))))
            y.append(np.linspace(60, 1, n)[:, None].round())
            a.append(np.stack([np.full(n, u), np.arange(n, dtype=float),
                               np.ones(n), np.ones(n)], axis=1))
        cat = lambda v: np.concatenate(v, axis=0)
        return cat(w), cat(xs), cat(xv), cat(t), cat(y), cat(a)

    dev = block(TRAIN_UNITS)
    test = block(TEST_UNITS)
    path = os.path.join(base, "N-CMAPSS_DS02-006.h5")
    with h5py.File(path, "w") as f:
        for suffix, blk in (("dev", dev), ("test", test)):
            for name, arr in zip(("W", "X_s", "X_v", "T", "Y", "A"), blk):
                f.create_dataset(f"{name}_{suffix}", data=arr)
        svar = lambda names: np.asarray([n.encode() for n in names],
                                        dtype="S20")
        f.create_dataset("W_var", data=svar(W_VARS))
        f.create_dataset("X_s_var", data=svar(XS_VARS))
        f.create_dataset("X_v_var", data=svar(XV_ALL))
        f.create_dataset("T_var", data=svar(T_VARS))
        f.create_dataset("A_var", data=svar(A_VARS))
    return str(tmp_path)


def test_ncmapss_contract_shapes(tmp_path):
    root = _write_h5(tmp_path)
    out = preprocess_ncmapss(root, window_size=10, stride=1, subsampling=2,
                             out_dir=os.path.join(str(tmp_path), "out"))
    assert out["train_x"].shape[1:] == (10, 20)
    assert set(out["test_x"]) == set(TEST_UNITS)
    assert out["train_y"].max() == 1.0  # normalized by the train max
    # MinMax(-1, 1) fit on train
    assert out["train_x"].min() >= -1 - 1e-6
    assert out["train_x"].max() <= 1 + 1e-6


def test_ncmapss_matches_reference(tmp_path):
    """Run the mounted reference N-CMAPSS preprocessor on the same h5 (in a
    pinned subprocess — the reference tree is untrusted) and compare arrays
    (window content, per-unit test dicts, max_rul)."""
    pytest.importorskip("torch")
    pytest.importorskip("sklearn")
    from ref_subprocess import run_reference_ncmapss
    root = _write_h5(tmp_path)

    ours = preprocess_ncmapss(root, window_size=10, stride=1, subsampling=2,
                              out_dir=os.path.join(str(tmp_path), "ours"))
    ref = run_reference_ncmapss(root, window_size=10, stride=1,
                                subsampling=2,
                                out_npz=os.path.join(str(tmp_path),
                                                     "ref.npz"))

    np.testing.assert_allclose(ours["train_x"], ref["train_x"], atol=1e-6)
    np.testing.assert_allclose(ours["train_y"].reshape(-1),
                               ref["train_y"].reshape(-1), atol=1e-7)
    assert set(ours["test_x"]) == set(ref["test_x"])
    for u in ref["test_x"]:
        np.testing.assert_allclose(ours["test_x"][u], ref["test_x"][u],
                                   atol=1e-6)
        np.testing.assert_allclose(ours["test_y"][u].reshape(-1),
                                   ref["test_y"][u].reshape(-1), atol=1e-7)
        assert float(ours["max_rul"][u]) == float(ref["max_rul"][u])


def test_loader_reads_reference_ncmapss_artifacts(tmp_path, monkeypatch):
    """Our device-resident loader must ingest the reference's NCMAPSS .pt
    artifacts (dict-of-test-sets keyed by float unit id) directly."""
    pytest.importorskip("torch")
    from ref_subprocess import run_reference_ncmapss
    root = _write_h5(tmp_path)
    monkeypatch.chdir(str(tmp_path))
    # window 25 > 20 channels: same geometry as the real dataset
    # (50 > 20), so the min-dim layout rule moves channels to axis 1.
    run_reference_ncmapss(root, window_size=25, stride=1, subsampling=1,
                          out_npz=os.path.join(str(tmp_path), "ref2.npz"))

    from gnn_rul_tpu.data.loader import load_dataset
    data = load_dataset(os.path.join(str(tmp_path), "Processed_dataset",
                                     "NCMAPSS"))
    assert data.is_dict_test and len(data.test) == 3
    # channel axis forced to axis 1 (reference dataloader.py:27-28)
    assert data.train_x.shape[1] == 20 and data.train_x.shape[2] == 25
    for _, (tx, ty) in data.test.items():
        assert tx.shape[1] == 20 and ty.shape[-1] == 1
