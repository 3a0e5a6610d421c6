"""Pallas whole-recurrence BiLSTM kernel: parity vs the scan (interpret
mode on CPU; real-chip parity is covered by test_pallas_tpu_hw.py's
pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_rul_tpu.ops.pallas.fused_lstm import (
    lstm_recurrence_pallas, lstm_recurrence_reference)
from gnn_rul_tpu.nn.recurrent import _LSTMParams, bilstm_fused
import flax.linen as nn


@pytest.mark.parametrize("t,b,h", [
    (12, 24, 30),    # LOGO trunk widths (Hp padding 30->32)
    (10, 13, 60),    # ragged batch, wider hidden
    (7, 8, 8),       # tiny, t prime (tblk=1 or 7)
])
def test_recurrence_parity_fwd_bwd(t, b, h):
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.normal(size=(t, 2, b, 4 * h)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(2, h, 4 * h)) * 0.2, jnp.float32)

    ys_ref, cf_ref = lstm_recurrence_reference(xg, w)
    ys_pal, cf_pal = lstm_recurrence_pallas(xg, w, True)
    np.testing.assert_allclose(np.asarray(ys_pal), np.asarray(ys_ref),
                               atol=1e-6, rtol=1e-6)
    # Final cell states are real values on the Pallas path too (ADVICE r4:
    # they used to come back as None).
    np.testing.assert_allclose(np.asarray(cf_pal), np.asarray(cf_ref),
                               atol=1e-6, rtol=1e-6)

    # Gradient parity with BOTH outputs consumed — the c_fin cotangent
    # must seed the reversed cell sweep exactly like the scan's.
    def loss(fn):
        def f(a, b_):
            ys, cf = fn(a, b_)
            return jnp.sum(jnp.sin(ys)) + jnp.sum(jnp.cos(cf))
        return jax.grad(f, argnums=(0, 1))

    gr = loss(lstm_recurrence_reference)(xg, w)
    gp = loss(lambda a, b_: lstm_recurrence_pallas(a, b_, True))(xg, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=1e-5, rtol=1e-5)


def test_bilstm_fused_pallas_impl_matches_scan():
    class Bi(nn.Module):
        impl: str
        @nn.compact
        def __call__(self, x):
            pf = _LSTMParams(16, name="f")(x.shape[-1])
            pb = _LSTMParams(16, name="b")(x.shape[-1])
            f, b, ((hf, cf), (hb, cb)) = bilstm_fused(x, pf, pb,
                                                      impl=self.impl)
            # Consume hidden outputs AND final cell states: the contract is
            # identical on every impl.
            return f + b + (cf + cb)[:, None, :]

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 11, 9)), jnp.float32)
    params = Bi(impl="scan").init(jax.random.PRNGKey(0), x)["params"]
    out_scan = Bi(impl="scan").apply({"params": params}, x)
    out_pal = Bi(impl="pallas").apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_scan),
                               atol=1e-6, rtol=1e-6)

    g_scan = jax.grad(lambda p: jnp.sum(
        Bi(impl="scan").apply({"params": p}, x) ** 2))(params)
    g_pal = jax.grad(lambda p: jnp.sum(
        Bi(impl="pallas").apply({"params": p}, x) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        g_pal, g_scan)
