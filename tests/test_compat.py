"""Checkpoint-import surface: a reference-format checkpoint.pt round-trips
through gnn_rul_tpu.compat and evaluates from the CLI."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, "/root/reference")


def _make_reference_checkpoint(tmp_path):
    """Build the reference FC_STGNN algorithm and save the exact
    checkpoint.pt format (reference utils.py:111-120: model_dict =
    algorithm.state_dict(), so keys carry the 'model.' prefix)."""
    import torch
    from parity_utils import patch_torch_cuda
    patch_torch_cuda()
    from algorithms.algorithms import get_algorithm_class
    from gnn_rul_tpu.configs import hparams

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    tp = hparams.train_params("CMAPSS", "FD001", "FC_STGNN")
    torch.manual_seed(0)
    algo = get_algorithm_class("FC_STGNN")(hp, tp, "cpu")
    path = os.path.join(str(tmp_path), "checkpoint.pt")
    torch.save({"configs": {"sequence_len": 50}, "hparams": dict(tp),
                "model_dict": algo.state_dict()}, path)
    return path, algo


def test_import_torch_checkpoint_strips_model_prefix(tmp_path):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from gnn_rul_tpu.compat import import_torch_checkpoint
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.fc_stgnn import FCSTGNN

    path, algo = _make_reference_checkpoint(tmp_path)
    variables = import_torch_checkpoint(path, "FC_STGNN",
                                        dataset="CMAPSS",
                                        dataset_id="FD001")
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    ours = FCSTGNN(**hp)
    x = np.random.default_rng(0).normal(size=(3, 14, 50)).astype(np.float32)
    algo.model.eval()
    with torch.no_grad():
        want = algo.model(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_cli_eval_torch_checkpoint(tmp_path):
    """End-to-end: the CLI evaluates a reference checkpoint on a tiny
    processed dataset and writes the metric artifacts."""
    pytest.importorskip("torch")
    path, _ = _make_reference_checkpoint(tmp_path)

    # Tiny processed CMAPSS-shaped dataset (native .npk format).
    from gnn_rul_tpu.data.io import save_processed
    rng = np.random.default_rng(1)
    ds_dir = os.path.join(str(tmp_path), "proc", "CMAPSS", "FD001")
    save_processed(ds_dir, "train",
                   rng.normal(size=(20, 14, 50)).astype(np.float32),
                   rng.uniform(size=(20, 1)).astype(np.float32), 125.0)
    save_processed(ds_dir, "test",
                   rng.normal(size=(10, 14, 50)).astype(np.float32),
                   rng.uniform(size=(10, 1)).astype(np.float32), 125.0)

    from gnn_rul_tpu.cli import main
    results = main([
        "--GNN_method", "FC_STGNN", "--dataset", "CMAPSS",
        "--dataset_id", "FD001",
        "--data_path", os.path.join(str(tmp_path), "proc"),
        "--save_dir", os.path.join(str(tmp_path), "logs"),
        "--eval_torch_checkpoint", path,
    ])
    (key, best), = results.items()
    assert key is None and len(best) == 4
    assert all(np.isfinite(v) for v in best)
    run_dir = os.path.join(str(tmp_path), "logs", "GNN_RUL", "run_1",
                           "FC_STGNN_eval")
    assert os.path.exists(os.path.join(run_dir, "results.csv"))
