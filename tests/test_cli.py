"""CLI integration: preprocess-artifact directory -> cli.main -> results."""

import os

import numpy as np

from gnn_rul_tpu.data.io import save_processed
from gnn_rul_tpu import cli


def test_cli_end_to_end(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    data_dir = os.path.join(str(tmp_path), "Processed_dataset", "CMAPSS",
                            "FD001")
    # Samples in the preprocessor layout (N, seq_len, channels).
    save_processed(data_dir, "train",
                   rng.normal(size=(40, 50, 14)).astype(np.float32),
                   rng.uniform(size=(40, 1)).astype(np.float32), 125)
    save_processed(data_dir, "test",
                   rng.normal(size=(10, 50, 14)).astype(np.float32),
                   rng.uniform(size=(10, 1)).astype(np.float32), 125)

    monkeypatch.chdir(str(tmp_path))
    # Short run: override epochs via a tiny custom hparams path is not
    # exposed on the CLI, so monkeypatch the bank.
    from gnn_rul_tpu.configs import hparams as bank
    orig = bank.train_params

    def fast_params(dataset, sub_id, method):
        p = orig(dataset, sub_id, method)
        p["num_epochs"] = 1
        p["batch_size"] = 16
        return p

    monkeypatch.setattr(bank, "train_params", fast_params)

    results = cli.main([
        "--GNN_method", "FC_STGNN", "--dataset", "CMAPSS",
        "--dataset_id", "FD001",
        "--data_path", os.path.join(str(tmp_path), "Processed_dataset"),
        "--save_dir", os.path.join(str(tmp_path), "logs"),
        "--num_runs", "1"])

    best = results[0][None]
    assert len(best) == 4 and all(np.isfinite(v) for v in best)
    run_dir = os.path.join(str(tmp_path), "logs", "GNN_RUL", "run_1",
                           "FC_STGNN_run_0")
    assert os.path.exists(os.path.join(run_dir, "results.csv"))


def test_cli_mesh_training(tmp_path, monkeypatch):
    """End-to-end CLI training over a (data, model) device mesh built from
    --mesh, on the virtual 8-device CPU mesh (the documented
    XLA_FLAGS=--xla_force_host_platform_device_count recipe)."""
    rng = np.random.default_rng(1)
    data_dir = os.path.join(str(tmp_path), "Processed_dataset", "CMAPSS",
                            "FD001")
    save_processed(data_dir, "train",
                   rng.normal(size=(32, 50, 14)).astype(np.float32),
                   rng.uniform(size=(32, 1)).astype(np.float32), 125)
    save_processed(data_dir, "test",
                   rng.normal(size=(8, 50, 14)).astype(np.float32),
                   rng.uniform(size=(8, 1)).astype(np.float32), 125)

    monkeypatch.chdir(str(tmp_path))
    from gnn_rul_tpu.configs import hparams as bank
    orig = bank.train_params

    def fast_params(dataset, sub_id, method):
        p = orig(dataset, sub_id, method)
        p["num_epochs"] = 1
        p["batch_size"] = 16  # divides the data axis (4)
        return p

    monkeypatch.setattr(bank, "train_params", fast_params)

    results = cli.main([
        "--GNN_method", "FC_STGNN", "--dataset", "CMAPSS",
        "--dataset_id", "FD001",
        "--data_path", os.path.join(str(tmp_path), "Processed_dataset"),
        "--save_dir", os.path.join(str(tmp_path), "logs"),
        "--num_runs", "1", "--mesh", "data=4,model=2",
    ])
    best = results[0][None]
    assert len(best) == 4 and all(np.isfinite(v) for v in best)


def test_parse_mesh_arg_rejects_garbage():
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cli.parse_mesh_arg("data=x")
    with _pytest.raises(ValueError):
        cli.parse_mesh_arg("foo=2")
