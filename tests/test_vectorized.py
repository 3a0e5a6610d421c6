"""Seed-parallel (vmapped) protocol runner: per-seed results must match
running the sequential Engine once per seed (same init streams, same
shuffles, same dropout chains, same optimizer updates — allclose up to
float reassociation)."""

import os

import numpy as np
import pytest

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.train.algorithms import get_algorithm_spec
from gnn_rul_tpu.train.engine import Engine
from gnn_rul_tpu.train.vectorized import VectorizedEngine

TP = {"num_epochs": 2, "batch_size": 16, "learning_rate": 1e-3,
      "weight_decay": 1e-4}
SEEDS = [0, 1, 2]


def _data(n=40, shape=(14, 50), seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n,) + shape).astype(np.float32)
    y = rng.uniform(size=(n, 1)).astype(np.float32)
    return x, y


def _spec_model(method="FC_STGNN", dataset="CMAPSS", sub="FD001"):
    spec = get_algorithm_spec(method)
    hp = hparams.model_hparams(dataset, sub, method)
    return spec, spec.model_cls(**hp)


@pytest.mark.slow
def test_vectorized_matches_sequential_per_seed():
    spec, model = _spec_model()
    x, y = _data()
    xt, _ = _data(n=12, seed=9)

    # Sequential: one Engine per seed, 2 epochs (incl. a remainder batch —
    # 40 rows at batch 16 leaves 8).
    seq_losses, seq_preds = [], []
    for seed in SEEDS:
        eng = Engine(model, spec, TP, seed=seed)
        st = eng.init_state(x)
        losses = []
        for epoch in (1, 2):
            st, loss = eng.run_epoch(st, x, y, epoch, shuffle=True)
            losses.append(loss)
        seq_losses.append(losses)
        seq_preds.append(eng.evaluate(st, xt))

    # Vectorized: all seeds in one program.
    veng = VectorizedEngine(model, spec, TP, seeds=SEEDS)
    vst = veng.init_state(x)
    v_losses = []
    for epoch in (1, 2):
        vst, vloss = veng.run_epoch(vst, x, y, epoch, shuffle=True)
        v_losses.append(vloss)
    v_preds = veng.evaluate(vst, xt)

    for i, seed in enumerate(SEEDS):
        np.testing.assert_allclose(
            [v_losses[0][i], v_losses[1][i]], seq_losses[i],
            rtol=2e-4, atol=2e-5,
            err_msg=f"per-epoch loss diverged for seed {seed}")
        np.testing.assert_allclose(
            v_preds[i], seq_preds[i], rtol=2e-3, atol=2e-4,
            err_msg=f"eval predictions diverged for seed {seed}")


@pytest.mark.slow
def test_vectorized_matches_sequential_aux_loss_method():
    """Generality beyond the flagship: a method with a train-time auxiliary
    loss (LOGO's GL loss, weight ``theta`` — reference
    algorithms/algorithms.py LOGO class) runs through the vmapped seed
    runner with per-seed results matching the sequential Engine."""
    spec, model = _spec_model("LOGO", "CMAPSS", "FD001")
    assert spec.aux_weight == "theta"
    tp = dict(TP, theta=0.01, batch_size=8)
    x, y = _data(n=20)
    xt, _ = _data(n=8, seed=9)
    seeds = [0, 1]

    seq_losses, seq_preds = [], []
    for seed in seeds:
        eng = Engine(model, spec, tp, seed=seed)
        st = eng.init_state(x)
        st, loss = eng.run_epoch(st, x, y, 1, shuffle=True)
        seq_losses.append(loss)
        seq_preds.append(eng.evaluate(st, xt))

    veng = VectorizedEngine(model, spec, tp, seeds=seeds)
    vst = veng.init_state(x)
    vst, vloss = veng.run_epoch(vst, x, y, 1, shuffle=True)
    v_preds = veng.evaluate(vst, xt)

    for i, seed in enumerate(seeds):
        np.testing.assert_allclose(vloss[i], seq_losses[i],
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"aux-loss epoch seed {seed}")
        np.testing.assert_allclose(v_preds[i], seq_preds[i],
                                   rtol=2e-3, atol=2e-4,
                                   err_msg=f"aux-loss eval seed {seed}")


def test_vectorized_init_matches_sequential_init():
    """Per-seed parameter init streams are identical (not merely close:
    the same PRNGKey(seed) fold-ins)."""
    import jax
    spec, model = _spec_model()
    x, _ = _data(n=4)
    veng = VectorizedEngine(model, spec, TP, seeds=SEEDS)
    vst = veng.init_state(x)
    for i, seed in enumerate(SEEDS):
        eng = Engine(model, spec, TP, seed=seed)
        st = eng.init_state(x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a)[i], np.asarray(b)),
            vst.params, st.params)


def test_slice_state_round_trip():
    spec, model = _spec_model()
    x, y = _data(n=20)
    veng = VectorizedEngine(model, spec, TP, seeds=[0, 1])
    vst = veng.init_state(x)
    vst, _ = veng.run_epoch(vst, x, y, 1, shuffle=True)
    s1 = veng.slice_state(vst, 1)
    import jax
    shapes_full = jax.tree_util.tree_leaves(vst.params)[0].shape
    shapes_one = jax.tree_util.tree_leaves(s1.params)[0].shape
    assert shapes_full[0] == 2 and shapes_one == shapes_full[1:]
    assert s1.step.ndim == 0


@pytest.mark.slow
def test_trainer_vectorized_end_to_end(tmp_path):
    """Trainer(vectorized_runs=True) writes the same artifact tree as the
    sequential path and produces per-seed results close to it."""
    from gnn_rul_tpu.data.loader import DataBundle
    from gnn_rul_tpu.train.trainer import Trainer

    x, y = _data(n=40)
    xt, yt = _data(n=12, seed=9)
    data = DataBundle(train_x=x, train_y=y, test=(xt, yt), max_ruls=125)

    kwargs = dict(
        method="FC_STGNN", dataset="CMAPSS", dataset_id="FD001", data=data,
        experiment_description="exp", run_description="r",
        num_runs=2, train_params=dict(TP))

    t_seq = Trainer(save_dir=str(tmp_path / "seq"), **kwargs)
    res_seq = t_seq.train()
    t_vec = Trainer(save_dir=str(tmp_path / "vec"), vectorized_runs=True,
                    **kwargs)
    res_vec = t_vec.train()

    assert set(res_vec) == set(res_seq) == {0, 1}
    for run_id in (0, 1):
        run_dir = tmp_path / "vec" / "exp" / "r" / f"FC_STGNN_run_{run_id}"
        assert (run_dir / "results.csv").exists()
        assert (run_dir / "results.npz").exists()
        assert (run_dir / "checkpoint.pkl").exists()
        b_seq = np.asarray(res_seq[run_id][None], np.float64)
        b_vec = np.asarray(res_vec[run_id][None], np.float64)
        # Best-RMSE rows track each other (2 epochs of drift tolerance).
        np.testing.assert_allclose(b_vec, b_seq, rtol=5e-3)


@pytest.mark.slow
def test_vectorized_logo_bearing_grads_finite(tmp_path):
    """Regression: XLA miscompiled the transpose of the vmapped rolled
    scan at unroll=1 in the LOGO_bearing trunk — the jitted seed-parallel
    epoch produced inf in bi_lstm2_bwd/w_ih for one seed while the
    un-jitted vmapped grad and every per-seed jitted grad of the same
    jaxpr were finite (~1e-4). Triggered by real preprocessor-shaped data
    (a synthetic raw PHM2012 tree through the offline pipeline), not by
    plain random arrays; `_auto_unroll` now never emits a rolled unroll=1
    scan (nn/recurrent.py). This test replays the failing configuration
    end-to-end and asserts finite state and predictions per seed."""
    rng = np.random.default_rng(0)
    base = tmp_path / "Datasets" / "PHM_2012_Bearing_Datasets"
    for split, names in [("Learning_set", ["Bearing1_1", "Bearing1_2"]),
                         ("Test_set", ["Bearing1_3"])]:
        for name in names:
            d = base / split / name
            d.mkdir(parents=True)
            for i in range(1, 9):
                mat = rng.normal(size=(2560, 6)).astype(np.float32)
                np.savetxt(d / f"acc_{i:05d}.csv", mat, fmt="%.5f",
                           delimiter=",")

    from gnn_rul_tpu.data.phm2012 import preprocess_phm2012
    from gnn_rul_tpu.data.loader import load_dataset
    out = preprocess_phm2012(str(tmp_path / "Datasets"), 1,
                             out_dir=str(tmp_path / "Processed"))
    data = load_dataset(os.path.join(str(tmp_path / "Processed"),
                                     "PHM2012", "Condition_1"))

    spec, model = _spec_model("LOGO_bearing", "PHM2012", "Condition_1")
    tp = {"num_epochs": 1, "batch_size": 100, "learning_rate": 1e-3,
          "weight_decay": 1e-4, "theta": 0.001}
    veng = VectorizedEngine(model, spec, tp, seeds=[0, 1])
    vst = veng.init_state(data.train_x)
    vst, vloss = veng.run_epoch(vst, data.train_x, data.train_y, 1,
                                shuffle=True)
    assert np.isfinite(np.asarray(vloss)).all(), np.asarray(vloss)
    import jax
    for leaf in jax.tree_util.tree_leaves(vst.params):
        assert np.isfinite(np.asarray(leaf)).all()
    xt = next(iter(data.test.values()))[0]
    preds = np.asarray(veng.evaluate(vst, xt))
    assert np.isfinite(preds).all()


def test_trainer_vectorized_rejects_mesh_and_resume(tmp_path):
    from gnn_rul_tpu.data.loader import DataBundle
    from gnn_rul_tpu.train.trainer import Trainer
    from gnn_rul_tpu.parallel.mesh import make_mesh

    x, y = _data(n=20)
    data = DataBundle(train_x=x, train_y=y, test=(x[:4], y[:4]),
                      max_ruls=125)
    kwargs = dict(method="FC_STGNN", dataset="CMAPSS", dataset_id="FD001",
                  data=data, save_dir=str(tmp_path), num_runs=2,
                  train_params=dict(TP))
    with pytest.raises(ValueError, match="single-device"):
        Trainer(vectorized_runs=True, mesh=make_mesh(n_data=2), **kwargs)
    with pytest.raises(ValueError, match="resume"):
        Trainer(vectorized_runs=True, resume=True, **kwargs)
