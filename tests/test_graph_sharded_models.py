"""Node-sharded graph engine generalized beyond FC_STGNN: op-level and
model-level equality vs the local path on the 8-device CPU mesh, plus the
Trainer injection map for every supports_spmm_fn method."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.parallel.graph_partition import (
    node_sharded_gat, node_sharded_spmm, spmm_hook_kwargs)
from gnn_rul_tpu.parallel.mesh import make_mesh
from gnn_rul_tpu.train.algorithms import get_algorithm_spec


# ------------------------------------------------------------------ op level

@pytest.mark.parametrize("n,k", [(16, 4), (14, 4), (13, 2)])
def test_node_sharded_spmm_equals_local(n, k):
    """Including N not divisible by the axis size (zero-pad + slice)."""
    mesh = make_mesh(n_data=1, n_model=k)
    rng = np.random.default_rng(0)
    adj = jnp.asarray(rng.normal(size=(6, n, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(6, n, 5)), jnp.float32)
    local = jnp.einsum("bnm,bmd->bnd", adj, x)
    sharded = jax.jit(functools.partial(
        node_sharded_spmm, mesh=mesh, axis="model"))(adj, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-5, rtol=1e-5)


def test_node_sharded_spmm_unbatched_adj():
    mesh = make_mesh(n_data=1, n_model=4)
    rng = np.random.default_rng(1)
    adj = jnp.asarray(rng.normal(size=(10, 10)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(3, 10, 4)), jnp.float32)
    local = jnp.einsum("nm,bmd->bnd", adj, x)
    sharded = node_sharded_spmm(adj, x, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n,k", [(16, 4), (30, 4)])  # 30: padded rows+cols
def test_node_sharded_gat_equals_local(n, k):
    """Padded columns must NOT leak into real rows' softmax normalizers."""
    mesh = make_mesh(n_data=1, n_model=k)
    rng = np.random.default_rng(2)
    b, d = 5, 7
    wh = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    adj = jnp.asarray((rng.uniform(size=(n, n)) > 0.5).astype(np.float32))
    bias, slope = 0.3, 0.1

    e = f1[:, :, None] + f2[:, None, :] + bias
    e = jax.nn.leaky_relu(e, slope)
    attn = jax.nn.softmax(e, axis=-1) * adj
    local = jnp.einsum("bnm,bmd->bnd", attn, wh)

    sharded = jax.jit(functools.partial(
        node_sharded_gat, mesh=mesh, axis="model"))(
        wh, f1, f2, adj, bias, slope)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               atol=1e-5, rtol=1e-5)


def test_node_sharded_gat_dropout_is_valid_dropout():
    """With dropout, each kept entry is attn/(1-p) and drops are 0 — same
    law as the local path (stream differs by device; documented)."""
    mesh = make_mesh(n_data=1, n_model=2)
    rng = np.random.default_rng(3)
    n, b, d, p = 8, 3, 4, 0.5
    wh = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    adj = jnp.ones((n, n), jnp.float32)
    out = node_sharded_gat(wh, f1, f2, adj, 0.0, 0.1, mesh,
                           dropout=p, rng=jax.random.PRNGKey(0))
    out2 = node_sharded_gat(wh, f1, f2, adj, 0.0, 0.1, mesh,
                            dropout=p, rng=jax.random.PRNGKey(0))
    # Deterministic given the rng.
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # And different from the no-dropout panel.
    base = node_sharded_gat(wh, f1, f2, adj, 0.0, 0.1, mesh)
    assert not np.allclose(np.asarray(out), np.asarray(base))


# --------------------------------------------------------------- model level

def _forward(model, x, seed=0, train=False, rngs_extra=None):
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed)}, x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    out = model.apply(variables, x, train=train, rngs=rngs)
    return variables, out


MODEL_CASES = [
    # (method, dataset, sub_id, input shape) — one per hooked family
    ("LOGO", "CMAPSS", "FD001", (14, 50)),
    ("HierCorrPool", "CMAPSS", "FD004", (14, 50)),
    ("LOGO_bearing", "PHM2012", "Condition_1", (1, 2560)),
    ("HierCorrPool_bearing", "PHM2012", "Condition_1", (1, 2560)),
    ("GAT_LSTM", "PHM2012", "Condition_1", (1, 2560)),
    ("STFA", "CMAPSS", "FD001", (14, 50)),
]


@pytest.mark.slow
@pytest.mark.parametrize("method,dataset,sub_id,shape", MODEL_CASES)
def test_model_forward_equal_under_sharded_hook(method, dataset, sub_id,
                                                shape):
    mesh = make_mesh(n_data=2, n_model=4)
    spec = get_algorithm_spec(method)
    assert spec.supports_spmm_fn
    hp = dict(hparams.model_hparams(dataset, sub_id, method))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4,) + shape), jnp.float32)

    base = spec.model_cls(**hp)
    variables, out_local = _forward(base, x)

    hooked = spec.model_cls(**hp, **spmm_hook_kwargs(method, mesh))
    out_sharded = hooked.apply(variables, x, train=False,
                               rngs={"dropout": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_local),
                               atol=2e-4, rtol=2e-4,
                               err_msg=f"{method} diverged under the "
                                       f"node-sharded hook")


@pytest.mark.slow
def test_logo_trains_through_sharded_hook(tmp_path):
    """A bearing-family model actually TRAINS through the hooked engine on
    the mesh (grad flows through shard_map + collectives)."""
    from gnn_rul_tpu.train.engine import Engine

    mesh = make_mesh(n_data=2, n_model=4)
    spec = get_algorithm_spec("LOGO")
    hp = dict(hparams.model_hparams("CMAPSS", "FD001", "LOGO"))
    model = spec.model_cls(**hp, **spmm_hook_kwargs("LOGO", mesh))
    tp = {"num_epochs": 1, "batch_size": 8, "learning_rate": 1e-3,
          "weight_decay": 0.0, "theta": 0.1}
    eng = Engine(model, spec, tp, seed=0, mesh=mesh)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(16, 1)).astype(np.float32)
    st = eng.init_state(x)
    st, loss = eng.run_epoch(st, x, y, 1, shuffle=True)
    assert np.isfinite(loss)
    preds = eng.evaluate(st, x[:6])
    assert preds.shape == (6,) and np.isfinite(preds).all()


def test_spmm_hook_kwargs_covers_all_supported_methods():
    from gnn_rul_tpu.train.algorithms import registered_algorithms
    mesh = make_mesh(n_data=1, n_model=2)
    supported = [m for m in registered_algorithms()
                 if get_algorithm_spec(m).supports_spmm_fn]
    # The r4 review asked for >= 5 methods; we ship 7.
    assert len(supported) >= 5, supported
    for m in supported:
        kw = spmm_hook_kwargs(m, mesh)
        assert len(kw) == 1 and next(iter(kw)) in ("spmm_fn", "gat_fn")
    with pytest.raises(ValueError):
        spmm_hook_kwargs("STGNN", mesh)
