"""End-to-end trainer test on tiny synthetic data."""

import os

import numpy as np

from gnn_rul_tpu.data.loader import DataBundle
from gnn_rul_tpu.train.trainer import Trainer


def _synthetic_bundle(n_train=40, n_test=10):
    rng = np.random.default_rng(0)
    tx = rng.normal(size=(n_train, 14, 50)).astype(np.float32)
    ty = rng.uniform(size=(n_train, 1)).astype(np.float32)
    ex = rng.normal(size=(n_test, 14, 50)).astype(np.float32)
    ey = rng.uniform(size=(n_test, 1)).astype(np.float32)
    return DataBundle(tx, ty, (ex, ey), 125.0)


def test_trainer_end_to_end(tmp_path):
    data = _synthetic_bundle()
    trainer = Trainer(
        method="FC_STGNN", dataset="CMAPSS", dataset_id="FD001", data=data,
        save_dir=str(tmp_path), num_runs=1,
        train_params={"num_epochs": 2, "batch_size": 16,
                      "weight_decay": 1e-4, "learning_rate": 1e-3})
    results = trainer.train()
    assert 0 in results
    best = results[0][None]
    assert len(best) == 4
    assert all(np.isfinite(v) for v in best)

    run_dir = os.path.join(str(tmp_path), "exp", "run", "FC_STGNN_run_0")
    assert os.path.exists(os.path.join(run_dir, "results.csv"))
    assert os.path.exists(os.path.join(run_dir, "results.npz"))
    assert os.path.exists(os.path.join(run_dir, "checkpoint.pkl"))


def test_trainer_dict_test_sets(tmp_path):
    rng = np.random.default_rng(1)
    tx = rng.normal(size=(30, 14, 50)).astype(np.float32)
    ty = rng.uniform(size=(30, 1)).astype(np.float32)
    test = {
        11.0: (rng.normal(size=(8, 14, 50)).astype(np.float32),
               rng.uniform(size=(8, 1)).astype(np.float32)),
        14.0: (rng.normal(size=(5, 14, 50)).astype(np.float32),
               rng.uniform(size=(5, 1)).astype(np.float32)),
    }
    data = DataBundle(tx, ty, test, {11.0: 80.0, 14.0: 80.0})
    trainer = Trainer(
        method="FC_STGNN", dataset="NCMAPSS", dataset_id=None, data=data,
        save_dir=str(tmp_path), num_runs=1,
        train_params={"num_epochs": 1, "batch_size": 16,
                      "weight_decay": 1e-4, "learning_rate": 1e-3},
        model_hparams={"patch_size": 25, "num_patch": 2,
                       "encoder_time_out": 27, "encoder_hidden_dim": 8,
                       "encoder_out_dim": 32, "encoder_conv_kernel": 2,
                       "hidden_dim": 8, "num_sequential": 6, "num_node": 14,
                       "num_windows": 2})
    results = trainer.train()
    assert set(results[0].keys()) == {11.0, 14.0}


def test_checkpoint_resume(tmp_path):
    """Restore from a checkpoint and verify identical predictions."""
    import jax.numpy as jnp
    from gnn_rul_tpu.train.checkpoint import save_checkpoint, restore_state
    from gnn_rul_tpu.train.engine import Engine
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec
    from gnn_rul_tpu.configs import hparams

    data = _synthetic_bundle()
    spec = get_algorithm_spec("FC_STGNN")
    model = spec.model_cls(**hparams.model_hparams("CMAPSS", "FD001",
                                                   "FC_STGNN"))
    tp = {"num_epochs": 1, "batch_size": 16, "weight_decay": 1e-4,
          "learning_rate": 1e-3}
    engine = Engine(model, spec, tp, seed=0)
    state = engine.init_state(data.train_x)
    state, _ = engine.run_epoch(state, data.train_x, data.train_y, 1, True)
    preds_before = engine.evaluate(state, data.test[0])

    ckpt = os.path.join(str(tmp_path), "ckpt.pkl")
    save_checkpoint(ckpt, state, extra={"epoch": 1})

    engine2 = Engine(model, spec, tp, seed=0)
    fresh = engine2.init_state(data.train_x)
    restored, extra = restore_state(ckpt, fresh)
    assert extra["epoch"] == 1
    preds_after = engine2.evaluate(restored, data.test[0])
    np.testing.assert_allclose(preds_before, preds_after, atol=1e-6)


def test_trainer_resume(tmp_path):
    """Interrupt after epoch 2, resume, and finish the remaining epochs."""
    data = _synthetic_bundle()
    common = dict(
        method="FC_STGNN", dataset="CMAPSS", dataset_id="FD001", data=data,
        save_dir=str(tmp_path), num_runs=1,
        train_params={"num_epochs": 2, "batch_size": 16,
                      "weight_decay": 1e-4, "learning_rate": 1e-3},
        checkpoint_every=1)
    Trainer(**common).train()

    # Second phase: more epochs, resuming from the epoch-2 checkpoint.
    common["train_params"]["num_epochs"] = 4
    t2 = Trainer(**common, resume=True)
    results = t2.train()
    best = results[0][None]
    assert all(np.isfinite(v) for v in best)


def test_load_reference_pt_artifacts(tmp_path):
    """The loader must read the reference's torch .pt artifact format."""
    import torch
    from gnn_rul_tpu.data.loader import load_dataset

    rng = np.random.default_rng(0)
    train_x = rng.normal(size=(20, 50, 14)).astype(np.float32)
    train_y = rng.uniform(size=(20, 1)).astype(np.float32)
    torch.save({"samples": train_x, "labels": train_y, "max_ruls": 125},
               os.path.join(str(tmp_path), "train.pt"))
    # dict-style test split (N-CMAPSS shape)
    torch.save({"samples": {11.0: train_x[:5]}, "labels": {11.0: train_y[:5]},
                "max_ruls": {11.0: 125.0}},
               os.path.join(str(tmp_path), "test.pt"))

    bundle = load_dataset(str(tmp_path))
    # channel axis forced to axis 1 (14 < 50)
    assert bundle.train_x.shape == (20, 14, 50)
    assert bundle.is_dict_test
    assert bundle.test[11.0][0].shape == (5, 14, 50)
    assert bundle.max_ruls == 125


def test_engine_no_batchnorm_model():
    """Models without BatchNorm (e.g. STGNN) must run through the scanned
    epoch: the batch_stats carry must be an empty plain dict, not a
    FrozenDict placeholder (lax.scan requires matching carry pytree types)."""
    import numpy as np
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec
    from gnn_rul_tpu.train.engine import Engine

    spec = get_algorithm_spec("STGNN")
    hp = hparams.model_hparams("CMAPSS", "FD001", "STGNN")
    tp = dict(hparams.train_params("CMAPSS", "FD001", "STGNN"))
    tp["num_epochs"] = 1
    tp["batch_size"] = 8
    engine = Engine(spec.model_cls(**hp), spec, tp, seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(20, 1)).astype(np.float32)
    state = engine.init_state(x)
    state, loss = engine.run_epoch(state, x, y, 1, shuffle=True)
    assert np.isfinite(loss)
    preds = engine.evaluate(state, x[:5])
    assert np.all(np.isfinite(preds))
