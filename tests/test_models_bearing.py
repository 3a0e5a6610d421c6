"""Forward-shape and gradient smoke tests for the bearing model zoo
(PHM2012 Condition_1 configs, L=2560)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.train.algorithms import get_algorithm_spec

BEARING = ["SAGCN", "STNet", "ST_GCN", "GAT_LSTM", "GDAGDL", "STMSGCN",
           "AGCN_TF", "LOGO_bearing", "HierCorrPool_bearing"]


def _make(method):
    spec = get_algorithm_spec(method)
    hp = hparams.model_hparams("PHM2012", "Condition_1", method)
    return spec.model_cls(**hp), spec


@pytest.mark.parametrize("method", BEARING)
def test_forward_shape(method):
    model, _ = _make(method)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 1, 2560)),
                    dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    out = model.apply(variables, x, train=False)
    pred = out[0] if isinstance(out, tuple) else out
    assert pred.shape == (3, 1)
    assert np.all(np.isfinite(np.asarray(pred)))


@pytest.mark.parametrize("method", BEARING)
def test_train_mode_and_grads(method):
    model, _ = _make(method)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 1, 2560)), dtype=jnp.float32)
    y = jnp.asarray(rng.uniform(size=(2, 1)), dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **others}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
        if isinstance(out, tuple):
            pred, aux = out
            return jnp.mean((pred - y) ** 2) + 0.001 * jnp.mean(aux)
        return jnp.mean((out - y) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
