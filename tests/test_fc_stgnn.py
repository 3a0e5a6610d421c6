"""FC_STGNN forward-shape and training smoke tests (FD001 config)."""

import numpy as np
import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
from gnn_rul_tpu.train.algorithms import get_algorithm_spec
from gnn_rul_tpu.train.engine import Engine


def _build(dataset_id="FD001"):
    hp = hparams.model_hparams("CMAPSS", dataset_id, "FC_STGNN")
    return FCSTGNN(**hp), hp


def test_forward_shape_fd001():
    model, _ = _build()
    x = jnp.zeros((4, 14, 50))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (4, 1)


def test_forward_shape_fd004():
    model, _ = _build("FD004")
    x = jnp.zeros((3, 14, 50))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (3, 1)


def test_train_reduces_loss():
    """A few epochs on a synthetic separable task must reduce the loss."""
    rng = np.random.default_rng(0)
    n = 64
    x = rng.normal(size=(n, 14, 50)).astype(np.float32)
    # target correlated with the mean signal so it's learnable
    y = (x.mean(axis=(1, 2), keepdims=False)[:, None] * 0.3 + 0.5).astype(
        np.float32)

    model, _ = _build()
    spec = get_algorithm_spec("FC_STGNN")
    tp = {"num_epochs": 5, "batch_size": 16, "weight_decay": 1e-4,
          "learning_rate": 1e-3}
    engine = Engine(model, spec, tp, seed=0)
    state = engine.init_state(x)

    losses = []
    for epoch in range(1, 6):
        state, loss = engine.run_epoch(state, x, y, epoch, shuffle=True)
        losses.append(loss)
    assert losses[-1] < losses[0]

    preds = engine.evaluate(state, x)
    assert preds.shape == (n,)
    assert np.all(np.isfinite(preds))


def test_remainder_batch_handled():
    """n not divisible by batch size must still train (drop_last=False)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(37, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(37, 1)).astype(np.float32)
    model, _ = _build()
    spec = get_algorithm_spec("FC_STGNN")
    tp = {"num_epochs": 1, "batch_size": 16, "weight_decay": 1e-4,
          "learning_rate": 1e-3}
    engine = Engine(model, spec, tp, seed=0)
    state = engine.init_state(x)
    state, loss = engine.run_epoch(state, x, y, 1, shuffle=True)
    assert np.isfinite(loss)
    assert int(state.step) == 3  # 2 full batches + 1 remainder
