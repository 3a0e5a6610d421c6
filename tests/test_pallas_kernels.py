"""Pallas kernel correctness in interpreter mode (CPU)."""

import numpy as np
import jax.numpy as jnp

from gnn_rul_tpu.ops.pallas.fused_gnn import (
    fused_dot_graph_spmm_pallas, fused_dot_graph_spmm_reference)
from gnn_rul_tpu.ops.windows import decay_mask


def test_fused_gnn_matches_reference_interpret():
    rng = np.random.default_rng(0)
    b, n, d, f = 6, 28, 16, 16
    h = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    mask = decay_mask(14, 2, 0.7)

    want = np.asarray(fused_dot_graph_spmm_reference(h, x, mask))
    got = np.asarray(fused_dot_graph_spmm_pallas(h, x, mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_gnn_unaligned_shapes():
    rng = np.random.default_rng(1)
    b, n, d, f = 3, 30, 20, 9
    h = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(n, n)), jnp.float32)

    want = np.asarray(fused_dot_graph_spmm_reference(h, x, mask))
    got = np.asarray(fused_dot_graph_spmm_pallas(h, x, mask, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
