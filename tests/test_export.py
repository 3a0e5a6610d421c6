"""AOT serving export (gnn_rul_tpu.export): the serialized StableHLO
artifact must reproduce the live model's predictions, survive a file
round-trip, and serve arbitrary batch sizes (symbolic batch, or
pad/trim under a fixed-batch program)."""

import json

import numpy as np
import pytest

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.export import (export_serving, load_artifact,
                                save_artifact)
from gnn_rul_tpu.train.algorithms import get_algorithm_spec


def _variables(method="FC_STGNN", dataset="CMAPSS", sub="FD001",
               shape=(14, 50)):
    import jax
    import jax.numpy as jnp

    spec = get_algorithm_spec(method)
    hp = hparams.model_hparams(dataset, sub, method)
    model = spec.model_cls(**hp)
    x0 = jnp.zeros((2,) + shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, train=False)
    return model, dict(variables), hp


def _direct(model, variables, x):
    out = model.apply({"params": variables["params"],
                       "batch_stats": variables.get("batch_stats", {})},
                      x, train=False)
    pred = out[0] if isinstance(out, tuple) else out
    return np.asarray(pred).reshape(-1)


def test_export_symbolic_batch_matches_apply():
    model, variables, hp = _variables()
    meta, blob = export_serving("FC_STGNN", "CMAPSS", "FD001", variables,
                                model_hparams=hp)
    assert meta["input_shape"] == [None, 14, 50]
    from jax import export as jexport
    served = jexport.deserialize(bytearray(blob))
    rng = np.random.default_rng(0)
    for b in (3, 7):
        x = rng.normal(size=(b, 14, 50)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(served.call(x)),
                                   _direct(model, variables, x),
                                   rtol=1e-5, atol=1e-5)


def test_export_symbolic_batch_axis_recurrence():
    """LOGO runs its Bi-LSTM over the BATCH axis (reference quirk,
    models/LOGO/Model.py), so under shape-polymorphic export the scan
    length itself is symbolic — regression for the isinstance(int) guards
    in nn.recurrent's unroll policy and Pallas dispatch (a symbolic T must
    fall back to an unrolled=1 scan, never the kernel)."""
    model, variables, hp = _variables("LOGO")
    meta, blob = export_serving("LOGO", "CMAPSS", "FD001", variables,
                                model_hparams=hp)
    assert meta["input_shape"][0] is None
    from jax import export as jexport
    served = jexport.deserialize(bytearray(blob))
    x = np.random.default_rng(3).normal(size=(3, 14, 50)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(served.call(x)),
                               _direct(model, variables, x),
                               rtol=1e-4, atol=1e-4)


def test_artifact_roundtrip_and_fixed_batch(tmp_path):
    model, variables, hp = _variables()
    meta, blob = export_serving("FC_STGNN", "CMAPSS", "FD001", variables,
                                batch_size=4, model_hparams=hp,
                                max_rul=125.0)
    p = str(tmp_path / "m.ghlo")
    save_artifact(p, meta, blob)
    served = load_artifact(p)
    assert served.meta["max_rul"] == 125.0
    assert served.meta["input_shape"] == [4, 14, 50]

    # 6 rows through a fixed-batch-4 program: pad/trim must be invisible.
    x = np.random.default_rng(1).normal(size=(6, 14, 50)).astype(np.float32)
    np.testing.assert_allclose(served(x), _direct(model, variables, x),
                               rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError):
        served(x[:, :3])  # wrong channel count


def test_export_cli_from_checkpoint(tmp_path, capsys):
    from gnn_rul_tpu.export import main
    from gnn_rul_tpu.train.checkpoint import save_checkpoint
    from gnn_rul_tpu.train.engine import TrainState

    model, variables, hp = _variables()
    ckpt = str(tmp_path / "checkpoint.pkl")
    save_checkpoint(ckpt, TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None, step=np.int32(0)),
        extra={"hparams": dict(hp)})

    out = str(tmp_path / "m.ghlo")
    main(["--checkpoint", ckpt, "--GNN_method", "FC_STGNN",
          "--dataset", "CMAPSS", "--dataset_id", "FD001",
          "--out", out, "--max_rul", "125"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["artifact"] == out and row["bytes"] > 0

    served = load_artifact(out)
    x = np.random.default_rng(2).normal(size=(5, 14, 50)).astype(np.float32)
    np.testing.assert_allclose(served(x), _direct(model, variables, x),
                               rtol=1e-5, atol=1e-5)
