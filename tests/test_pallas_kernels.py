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


def test_fused_trainable_gradients_match_reference():
    """custom_vjp backward must equal autodiff through the jnp reference."""
    import jax
    from gnn_rul_tpu.ops.pallas.fused_gnn import (
        fused_dot_graph_spmm_trainable)

    rng = np.random.default_rng(2)
    b, n, d, f = 4, 12, 8, 8
    h = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(n, n)), jnp.float32)

    def loss_fused(h, x):
        return jnp.sum(fused_dot_graph_spmm_trainable(h, x, mask) ** 2)

    def loss_ref(h, x):
        return jnp.sum(fused_dot_graph_spmm_reference(h, x, mask) ** 2)

    gh1, gx1 = jax.grad(loss_fused, argnums=(0, 1))(h, x)
    gh2, gx2 = jax.grad(loss_ref, argnums=(0, 1))(h, x)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
