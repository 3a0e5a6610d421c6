"""Smoke tests for the round-5 measurement harnesses:

- bench_accuracy --data_root (real-preprocessor path, `make accuracy
  DATA_ROOT=...`) on a synthetic raw CMAPSS tree
- bench_scaling (weak-scaling schema on the virtual CPU mesh)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env_cpu(n=8):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


@pytest.mark.slow
def test_accuracy_real_data_path(tmp_path):
    """`bench_accuracy --data_root` drives the REAL CMAPSS preprocessor on
    a raw tree and runs the protocol on its output."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_data_cmapss import _write_raw
    _write_raw(str(tmp_path), n_train_engines=4, n_test_engines=2)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_accuracy.py"),
         "--data_root", str(tmp_path), "--tiers", "t1", "--epochs", "2",
         "--runs-ours", "1", "--skip-torch"],
        capture_output=True, text=True, timeout=900, env=_env_cpu(1),
        cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    summary = [r for r in rows if r.get("source")]
    assert summary and summary[0]["source"] == "real"
    run_rows = [r for r in rows if r.get("fw", "").startswith("ours")]
    assert run_rows and len(run_rows[0]["best"]) == 4
    assert all(np.isfinite(v) for v in run_rows[0]["best"])


@pytest.mark.slow
def test_bench_scaling_schema():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_scaling.py"),
         "--sizes", "1,2", "--steps", "2", "--per_device_batch", "4"],
        capture_output=True, text=True, timeout=900, env=_env_cpu(2),
        cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    curve = [r for r in rows if r["metric"] == "scaling_fc_stgnn_fd001"]
    assert [r["mesh_data"] for r in curve] == [1, 2]
    assert curve[0]["efficiency"] == 1.0
    final = [r for r in rows if r["metric"] == "scaling_efficiency"]
    assert final and final[0]["target"] == 0.8


@pytest.mark.slow
def test_bench_serve_schema():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_serve.py"),
         "--batches", "4", "--steps", "3"],
        capture_output=True, text=True, timeout=900, env=_env_cpu(1),
        cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.splitlines()
            if l.startswith("{")]
    by_metric = {r["metric"]: r for r in rows}
    assert by_metric["serve_fc_stgnn_fd001_jit"]["value"] > 0
    assert by_metric["serve_fc_stgnn_fd001_artifact"]["value"] > 0


def test_bf16_guidance_table():
    from gnn_rul_tpu.train.precision import bf16_guidance
    # Measured-losing tiers warn; winning tiers don't; unknown tiers don't.
    assert "0.80x" in bf16_guidance("ST_GCN", "PHM2012")
    assert "0.93x" in bf16_guidance("GAT_LSTM", "XJTU_SY")
    assert bf16_guidance("GRU_CM", "NCMAPSS") is None
    assert bf16_guidance("FC_STGNN", "CMAPSS") is None
    assert bf16_guidance("NoSuch", "CMAPSS") is None


def test_vectorized_guidance_table():
    from gnn_rul_tpu.train.precision import vectorized_guidance
    # Seed-parallel measured to LOSE on the MXU-/recurrence-bound tiers.
    assert "0.77x" in vectorized_guidance("DVGTformer", "NCMAPSS")
    assert "0.60x" in vectorized_guidance("LOGO_bearing", "PHM2012")
    # Winning tiers and unmeasured tiers warn nothing.
    assert vectorized_guidance("ST_GCN", "PHM2012") is None
    assert vectorized_guidance("FC_STGNN", "CMAPSS") is None
    assert vectorized_guidance("NoSuch", "CMAPSS") is None


def test_trainer_warns_on_measured_vectorized_loss(tmp_path, caplog):
    import logging
    from gnn_rul_tpu.data.loader import DataBundle
    from gnn_rul_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(8, 1)).astype(np.float32)
    data = DataBundle(train_x=x, train_y=y, test=(x[:2], y[:2]),
                      max_ruls=125)
    tp = {"num_epochs": 1, "batch_size": 4, "learning_rate": 1e-3,
          "weight_decay": 0.0}
    with caplog.at_level(logging.WARNING):
        Trainer(method="DVGTformer", dataset="NCMAPSS", dataset_id=None,
                data=data, save_dir=str(tmp_path), train_params=tp,
                vectorized_runs=True)
    assert any("0.77x" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        Trainer(method="DVGTformer", dataset="NCMAPSS", dataset_id=None,
                data=data, save_dir=str(tmp_path), train_params=tp)
    assert not any("0.77x" in r.message for r in caplog.records)


def test_trainer_warns_on_measured_bf16_loss(tmp_path, caplog):
    import logging
    from gnn_rul_tpu.data.loader import DataBundle
    from gnn_rul_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 1, 2560)).astype(np.float32)
    y = rng.uniform(size=(8, 1)).astype(np.float32)
    data = DataBundle(train_x=x, train_y=y, test=(x[:2], y[:2]),
                      max_ruls=125)
    tp = {"num_epochs": 1, "batch_size": 4, "learning_rate": 1e-3,
          "weight_decay": 0.0}
    with caplog.at_level(logging.WARNING):
        Trainer(method="ST_GCN", dataset="PHM2012",
                dataset_id="Condition_1", data=data,
                save_dir=str(tmp_path), train_params=tp, precision="bf16")
    assert any("0.80x" in r.message for r in caplog.records)
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        Trainer(method="ST_GCN", dataset="PHM2012",
                dataset_id="Condition_1", data=data,
                save_dir=str(tmp_path), train_params=tp, precision="fp32")
    assert not any("0.80x" in r.message for r in caplog.records)
