"""Unit tests for the recurrent layers: the fused bidirectional LSTM scan
must be numerically identical to running the two directions as separate
LSTMLayers, for every unroll factor (reference semantics:
torch.nn.LSTM(bidirectional=True), /root/reference/models/LOGO/Model.py:75-126)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnn_rul_tpu.nn.recurrent import (GRULayer, LSTM, LSTMLayer,
                                      bilstm_fused)


def _lstm_dir_params(rng, d, h):
    s = 1.0 / np.sqrt(h)
    u = lambda *shape: rng.uniform(-s, s, shape).astype(np.float32)
    return (jnp.asarray(u(d, 4 * h)), jnp.asarray(u(h, 4 * h)),
            jnp.asarray(u(4 * h)), jnp.asarray(u(4 * h)))


@pytest.mark.parametrize("unroll", [1, 4])
def test_bilstm_fused_matches_separate_directions(unroll):
    rng = np.random.default_rng(0)
    b, t, d, h = 3, 11, 5, 7
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    pf = _lstm_dir_params(rng, d, h)
    pb = _lstm_dir_params(rng, d, h)

    ys_f, ys_b, ((hf, cf), (hb, cb)) = bilstm_fused(x, pf, pb, unroll=unroll)

    def run_layer(p, reverse):
        layer = LSTMLayer(h, reverse=reverse, unroll=unroll)
        params = {"w_ih": p[0], "w_hh": p[1], "b_ih": p[2], "b_hh": p[3]}
        return layer.apply({"params": params}, x)

    want_f, (whf, wcf) = run_layer(pf, reverse=False)
    want_b, (whb, wcb) = run_layer(pb, reverse=True)

    np.testing.assert_allclose(ys_f, want_f, atol=1e-6)
    np.testing.assert_allclose(ys_b, want_b, atol=1e-6)
    np.testing.assert_allclose(hf, whf, atol=1e-6)
    np.testing.assert_allclose(cf, wcf, atol=1e-6)
    np.testing.assert_allclose(hb, whb, atol=1e-6)
    np.testing.assert_allclose(cb, wcb, atol=1e-6)


def test_bilstm_fused_gradients_match_separate_directions():
    rng = np.random.default_rng(1)
    b, t, d, h = 2, 9, 4, 6
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    pf = _lstm_dir_params(rng, d, h)
    pb = _lstm_dir_params(rng, d, h)

    def loss_fused(pf, pb, x):
        ys_f, ys_b, _ = bilstm_fused(x, pf, pb)
        return jnp.sum(ys_f * ys_b)

    def loss_separate(pf, pb, x):
        params_f = {"w_ih": pf[0], "w_hh": pf[1], "b_ih": pf[2],
                    "b_hh": pf[3]}
        params_b = {"w_ih": pb[0], "w_hh": pb[1], "b_ih": pb[2],
                    "b_hh": pb[3]}
        ys_f, _ = LSTMLayer(h).apply({"params": params_f}, x)
        ys_b, _ = LSTMLayer(h, reverse=True).apply({"params": params_b}, x)
        return jnp.sum(ys_f * ys_b)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(pf, pb, x)
    g_sep = jax.grad(loss_separate, argnums=(0, 1, 2))(pf, pb, x)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_fused),
                     jax.tree_util.tree_leaves(g_sep)):
        np.testing.assert_allclose(a, b_, atol=1e-5)


def test_multilayer_bidirectional_lstm_param_tree_unchanged():
    """The fused path must keep the l{K}_{fwd,bwd}/{w_ih,w_hh,b_ih,b_hh}
    tree so torch state_dict import mappings stay valid."""
    x = jnp.zeros((2, 8, 5), jnp.float32)
    m = LSTM(hidden=6, num_layers=2, bidirectional=True)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert sorted(params) == ["l0_bwd", "l0_fwd", "l1_bwd", "l1_fwd"]
    for sub in params.values():
        assert sorted(sub) == ["b_hh", "b_ih", "w_hh", "w_ih"]
    out, (h_n, c_n) = m.apply({"params": params}, x)
    assert out.shape == (2, 8, 12)
    assert h_n.shape == (4, 2, 6) and c_n.shape == (4, 2, 6)


@pytest.mark.parametrize("unroll", [1, 2, 4])
def test_gru_unroll_invariance(unroll):
    """Unrolling is a scheduling knob only — outputs must not change."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 13, 5)).astype(np.float32))
    m = GRULayer(hidden=6, unroll=1)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    base, base_h = m.apply({"params": params}, x)
    got, got_h = GRULayer(hidden=6, unroll=unroll).apply(
        {"params": params}, x)
    np.testing.assert_allclose(got, base, atol=1e-6)
    np.testing.assert_allclose(got_h, base_h, atol=1e-6)


def test_auto_unroll_never_emits_rolled_unroll_1():
    """Policy regression: a rolled scan at unroll=1 was observed to
    miscompile (inf grads) under vmap on both CPU and TPU backends
    (see nn/recurrent._auto_unroll and
    tests/test_vectorized.py::test_vectorized_logo_bearing_grads_finite).
    The auto policy must return either the full trip count (t) or an
    unroll >= 2 for every t > 1."""
    from gnn_rul_tpu.nn.recurrent import _auto_unroll
    for t in [2, 3, 4, 5, 8, 16, 20, 31, 32, 64, 100, 128, 200, 1000]:
        for b in [None, 16, 100, 384, 544]:
            u = _auto_unroll(0, t, b)
            assert u == t or u >= 2, (t, b, u)
    # t == 1 trivially fully unrolls.
    assert _auto_unroll(0, 1) == 1
