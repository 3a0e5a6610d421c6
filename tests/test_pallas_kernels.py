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


def _gat_inputs(b, n, d, seed=0, batched_adj=False):
    rng = np.random.default_rng(seed)
    wh = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    shape = (b, n, n) if batched_adj else (n, n)
    adj = jnp.asarray(rng.uniform(size=shape) > 0.4, jnp.float32)
    return wh, f1, f2, adj


def test_fused_gat_matches_reference_interpret():
    from gnn_rul_tpu.ops.pallas.fused_gat import (
        fused_gat_pallas, fused_gat_reference)

    wh, f1, f2, adj = _gat_inputs(5, 28, 24, seed=3, batched_adj=True)
    want = np.asarray(fused_gat_reference(wh, f1, f2, adj, 0.3, 0.1))
    got = np.asarray(
        fused_gat_pallas(wh, f1, f2, adj, 0.3, 0.1, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_gat_shared_adj_and_unaligned():
    from gnn_rul_tpu.ops.pallas.fused_gat import (
        fused_gat_pallas, fused_gat_reference)

    wh, f1, f2, adj = _gat_inputs(3, 14, 9, seed=4, batched_adj=False)
    want = np.asarray(fused_gat_reference(wh, f1, f2, adj, -0.2, 0.01))
    got = np.asarray(
        fused_gat_pallas(wh, f1, f2, adj, -0.2, 0.01, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_gat_trainable_gradients():
    import jax
    from gnn_rul_tpu.ops.pallas.fused_gat import (
        fused_gat_trainable, fused_gat_reference)

    wh, f1, f2, adj = _gat_inputs(2, 10, 8, seed=5, batched_adj=True)

    def loss_fused(wh, f1, f2):
        return jnp.sum(fused_gat_trainable(wh, f1, f2, adj, 0.1, 0.1) ** 2)

    def loss_ref(wh, f1, f2):
        return jnp.sum(fused_gat_reference(wh, f1, f2, adj, 0.1, 0.1) ** 2)

    import numpy as _np
    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(wh, f1, f2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(wh, f1, f2)
    for a, b in zip(g1, g2):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    atol=1e-4)


def test_gat_layer_fused_path_matches_jnp():
    """GraphAttentionLayer(fused="on") == plain-XLA path (eval mode)."""
    import jax
    from gnn_rul_tpu.nn.attention import GraphAttentionLayer

    rng = np.random.default_rng(6)
    h = jnp.asarray(rng.normal(size=(4, 14, 12)), jnp.float32)
    adj = jnp.asarray(rng.uniform(size=(4, 14, 14)) > 0.5, jnp.float32)

    base = GraphAttentionLayer(16, fused="off")
    fused = GraphAttentionLayer(16, fused="on")
    params = base.init(jax.random.PRNGKey(0), h, adj)
    want = np.asarray(base.apply(params, h, adj))
    got = np.asarray(fused.apply(params, h, adj))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_bwd_kernel_matches_jnp_vjp():
    """Fused backward kernel (interpret mode): dh/dx/dmask == the jnp vjp
    of the reference chain."""
    import jax
    from gnn_rul_tpu.ops.pallas.fused_gnn import (
        fused_dot_graph_spmm_reference, fused_dot_graph_spmm_bwd_pallas)

    rng = np.random.default_rng(9)
    for (b, n, d, f) in [(3, 20, 8, 10), (2, 5, 3, 4)]:
        h = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(n, n)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
        _, vjp = jax.vjp(fused_dot_graph_spmm_reference, h, x, mask)
        dh_w, dx_w, dmask_w = vjp(g)
        dh, dx, dmask_b = fused_dot_graph_spmm_bwd_pallas(h, x, mask, g,
                                                          interpret=True)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_w),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_w),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.sum(dmask_b, 0)),
                                   np.asarray(dmask_w), atol=2e-5,
                                   rtol=1e-4)


def test_fused_trainable_grads_mode_on():
    """custom_vjp with mode='on' routes through the Pallas bwd kernel
    (interpret on CPU) and matches reference grads."""
    import jax
    from gnn_rul_tpu.ops.pallas.fused_gnn import (
        fused_dot_graph_spmm_reference, fused_dot_graph_spmm_trainable)

    rng = np.random.default_rng(10)
    h = jnp.asarray(rng.normal(size=(2, 12, 6)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 12, 7)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(12, 12)), jnp.float32)

    def loss_on(h, x, mask):
        return jnp.sum(fused_dot_graph_spmm_trainable(h, x, mask, "on") ** 2)

    def loss_ref(h, x, mask):
        return jnp.sum(fused_dot_graph_spmm_reference(h, x, mask) ** 2)

    g1 = jax.grad(loss_on, argnums=(0, 1, 2))(h, x, mask)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(h, x, mask)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_fused_kernels_bf16_inputs():
    """bf16 activations through the fused kernels (interpret mode): the
    --precision bf16 path feeds bfloat16 h/x/g; accumulation stays fp32
    (preferred_element_type), outputs cast back to the input dtype."""
    import jax
    from gnn_rul_tpu.ops.pallas.fused_gnn import (
        fused_dot_graph_spmm_reference, fused_dot_graph_spmm_pallas,
        fused_dot_graph_spmm_packed)

    rng = np.random.default_rng(11)
    h = jnp.asarray(rng.normal(size=(2, 12, 6)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 12, 7)), jnp.bfloat16)
    mask = jnp.asarray(rng.uniform(size=(12, 12)), jnp.bfloat16)

    want = fused_dot_graph_spmm_reference(h, x, mask)
    got_p = fused_dot_graph_spmm_pallas(h, x, mask, interpret=True)
    got_k = fused_dot_graph_spmm_packed(h, x, mask, interpret=True)
    assert got_p.dtype == jnp.bfloat16 and got_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got_p, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.1)  # bf16 mantissa
    np.testing.assert_allclose(
        np.asarray(got_k, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.1)
