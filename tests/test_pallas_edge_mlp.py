"""Fused edge-MLP+sum kernel (GRU_CM hot op): parity vs the XLA panel
path, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rul_tpu.ops.pallas.fused_edge_mlp import (
    edge_mlp_sum, edge_mlp_sum_reference)


@pytest.mark.parametrize("m,n,d", [
    (40, 20, 10),   # N-CMAPSS GRU_CM shape family (d pads 10->16)
    (7, 5, 8),      # ragged m, aligned d
    (130, 3, 3),    # m spans two lane tiles after padding
])
def test_edge_mlp_sum_parity(m, n, d):
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.normal(size=(m, n, d)), jnp.float32)
    p2 = jnp.asarray(rng.normal(size=(m, n, d)), jnp.float32)

    out_ref = edge_mlp_sum_reference(p1, p2)
    out_pal = edge_mlp_sum(p1, p2, True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)

    def loss(fn):
        return jax.grad(lambda a, b: jnp.sum(jnp.sin(fn(a, b))),
                        argnums=(0, 1))

    gr = loss(edge_mlp_sum_reference)(p1, p2)
    gp = loss(lambda a, b: edge_mlp_sum(a, b, True))(p1, p2)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=1e-5, rtol=1e-5)


def test_gru_cm_fused_matches_plain():
    from gnn_rul_tpu.models.gru_cm import GRUCM

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 20, 50)), jnp.float32)
    plain = GRUCM(num_nodes=20, time_length=50, fused="off")
    fused = GRUCM(num_nodes=20, time_length=50, fused="on")
    params = plain.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x,
                        train=False)["params"]
    out_p = plain.apply({"params": params}, x, train=False)
    out_f = fused.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5, rtol=1e-5)
