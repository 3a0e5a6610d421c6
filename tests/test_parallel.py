"""Mesh/sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_rul_tpu.parallel.mesh import make_mesh, shard_params, batch_sharding
from gnn_rul_tpu.parallel.dp import ShardedTrainer
from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(n_data=4, n_model=2)


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 4, "model": 2}


def test_sharded_train_step_matches_single_device(mesh):
    """One sharded train step must agree with the unsharded computation."""
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(8, 1)).astype(np.float32)

    st = ShardedTrainer(model, mesh, lr=1e-3, weight_decay=1e-4,
                        min_shard_dim=8)
    state = st.init(jax.random.PRNGKey(0), x[:2])
    state2, loss_sharded = st.step(state, x, y, jax.random.PRNGKey(1))

    # Unsharded reference step with identical params/batch.
    import optax
    from gnn_rul_tpu.train.engine import make_optimizer, mse
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(x[:2]), train=False)
    tx = make_optimizer(1e-3, 1e-4)

    params = variables["params"]
    bs = variables.get("batch_stats", {})

    def loss_fn(p):
        out, upd = model.apply(
            {"params": p, "batch_stats": bs}, jnp.asarray(x), train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
        return mse(out, jnp.asarray(y)), upd

    (loss_ref, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(params)

    np.testing.assert_allclose(float(loss_sharded), float(loss_ref),
                               rtol=2e-5)


def test_sharded_eval_finite(mesh):
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp)
    st = ShardedTrainer(model, mesh, lr=1e-3, min_shard_dim=8)
    x = np.random.default_rng(1).normal(size=(8, 14, 50)).astype(np.float32)
    state = st.init(jax.random.PRNGKey(0), x[:2])
    preds = st.evaluate(state, x)
    assert preds.shape == (8,)
    assert np.all(np.isfinite(np.asarray(preds)))


def test_param_sharding_rule(mesh):
    """Wide kernels land sharded over 'model'; small ones replicated."""
    params = {"big": jnp.zeros((16, 512)), "small": jnp.zeros((16, 8))}
    sharded = shard_params(params, mesh, min_shard_dim=256)
    big_spec = sharded["big"].sharding.spec
    small_spec = sharded["small"].sharding.spec
    assert big_spec == jax.sharding.PartitionSpec(None, "model")
    assert small_spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1)


def test_engine_with_mesh_matches_single_device(mesh):
    """Engine epochs under a mesh must produce the same losses as without."""
    from gnn_rul_tpu.train.engine import Engine
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    spec = get_algorithm_spec("FC_STGNN")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(32, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(32, 1)).astype(np.float32)
    tp = {"num_epochs": 2, "batch_size": 16, "weight_decay": 1e-4,
          "learning_rate": 1e-3}

    losses = {}
    for name, m in (("plain", None), ("mesh", mesh)):
        engine = Engine(FCSTGNN(**hp), spec, tp, seed=0, mesh=m)
        state = engine.init_state(x)
        ls = []
        for epoch in (1, 2):
            state, loss = engine.run_epoch(state, x, y, epoch, shuffle=True)
            ls.append(loss)
        losses[name] = ls
    np.testing.assert_allclose(losses["mesh"], losses["plain"], rtol=2e-5)


def test_node_sharded_graph_matches_reference(mesh):
    """Node-partitioned dot-graph aggregation == single-device result."""
    from gnn_rul_tpu.parallel.graph_partition import (
        node_sharded_dot_graph_spmm)
    from gnn_rul_tpu.ops.graphs import dot_graph
    from gnn_rul_tpu.ops.message_passing import spmm

    rng = np.random.default_rng(7)
    b, n, d = 4, 16, 8  # N=16 divisible by model axis (2)
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    want = np.asarray(spmm(dot_graph(x), v))
    got = np.asarray(node_sharded_dot_graph_spmm(x, v, mesh, axis="model"))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_ring_graph_matches_reference(mesh):
    """Ring-pipelined online-softmax aggregation == dense single-device."""
    from gnn_rul_tpu.parallel.graph_partition import ring_dot_graph_spmm
    from gnn_rul_tpu.ops.graphs import dot_graph
    from gnn_rul_tpu.ops.message_passing import spmm

    rng = np.random.default_rng(11)
    b, n, d, f = 4, 16, 8, 6
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)

    want = np.asarray(spmm(dot_graph(x), v))
    got = np.asarray(ring_dot_graph_spmm(x, v, mesh, axis="model"))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow  # 4-way ring + grad: ~70 s on the 2-CPU mesh
def test_ring_graph_four_way_and_grad():
    """4-way ring: values AND gradients match the dense computation."""
    from gnn_rul_tpu.parallel.graph_partition import ring_dot_graph_spmm
    from gnn_rul_tpu.ops.graphs import dot_graph
    from gnn_rul_tpu.ops.message_passing import spmm

    m = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(12)
    b, n, d = 2, 32, 8
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)

    def dense_loss(x, v):
        return jnp.sum(spmm(dot_graph(x), v) ** 2)

    def ring_loss(x, v):
        return jnp.sum(ring_dot_graph_spmm(x, v, m, axis="data") ** 2)

    np.testing.assert_allclose(float(ring_loss(x, v)),
                               float(dense_loss(x, v)), rtol=1e-5)
    gx_w, gv_w = jax.grad(dense_loss, argnums=(0, 1))(x, v)
    gx_g, gv_g = jax.grad(ring_loss, argnums=(0, 1))(x, v)
    np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gv_g), np.asarray(gv_w),
                               atol=2e-4, rtol=2e-4)


def test_node_sharded_graph_larger_axis():
    """Partition over the bigger 'data' axis (4-way) too."""
    from gnn_rul_tpu.parallel.graph_partition import (
        node_sharded_dot_graph_spmm)
    from gnn_rul_tpu.ops.graphs import dot_graph
    from gnn_rul_tpu.ops.message_passing import spmm

    m = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(8)
    b, n, d = 2, 32, 8
    x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    want = np.asarray(spmm(dot_graph(x), v))
    got = np.asarray(node_sharded_dot_graph_spmm(x, v, m, axis="data"))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_masked_engines_match_local_chain(mesh):
    """node-sharded and ring engines with separate similarity features and
    a decay mask == the local dot-graph+mask+SpMM chain."""
    from gnn_rul_tpu.parallel.graph_partition import (
        node_sharded_dot_graph_spmm, ring_dot_graph_spmm)
    from gnn_rul_tpu.ops.pallas.fused_gnn import (
        fused_dot_graph_spmm_reference)

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(3, 16, 6)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(3, 16, 5)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(16, 16)), jnp.float32)

    want = fused_dot_graph_spmm_reference(h, v, mask)
    got_ns = node_sharded_dot_graph_spmm(h, v, mesh, axis="model", mask=mask)
    got_ring = ring_dot_graph_spmm(h, v, mesh, axis="model", mask=mask)
    np.testing.assert_allclose(np.asarray(got_ns), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ring), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fc_stgnn_through_sharded_graph_engine(mesh):
    """FC_STGNN with its aggregation routed through the node-sharded graph
    engine: forward AND backward must match the local model exactly
    (same params, same batch). This is the graph-partition engine as a
    model capability, not a raw-tensor primitive."""
    import functools
    from gnn_rul_tpu.parallel.graph_partition import (
        node_sharded_dot_graph_spmm)
    from gnn_rul_tpu.train.engine import mse

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    spmm_fn = functools.partial(node_sharded_dot_graph_spmm, mesh=mesh,
                                axis="model")
    local = FCSTGNN(**hp, fused="off")
    sharded = FCSTGNN(**hp, fused="off", spmm_fn=spmm_fn)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(4, 1)).astype(np.float32)
    variables = local.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False)

    def loss_fn(model, params):
        out = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(x), train=False)
        return mse(out, jnp.asarray(y))

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(local, p))(
        variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(sharded, p))(
        variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4)
