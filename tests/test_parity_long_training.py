"""Extended training equivalence: 20 epochs of FC_STGNN on synthetic
CMAPSS-like data, identical initial weights, fixed batch order, no dropout —
our engine's per-epoch losses and final test metrics must track the torch
reference within floating-point drift."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
from gnn_rul_tpu.train.engine import make_optimizer, mse
from gnn_rul_tpu.train import metrics as our_metrics

from parity_utils import patch_torch_cuda
from test_parity_fc_stgnn import _import_weights

sys.path.insert(0, "/root/reference")


def _synthetic_cmapss(n_engines=8, seed=0):
    """Degradation-curve windows: x drifts with RUL so the task is learnable."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n_engines):
        life = int(rng.integers(80, 120))
        ruls = np.arange(life)[::-1]
        base = rng.normal(size=(14,))
        drift = rng.normal(size=(14,)) * 0.01
        series = (base[None, :] + np.outer(life - 1 - ruls, drift)
                  + rng.normal(size=(life, 14)) * 0.05)
        for s in range(life - 49):
            xs.append(series[s:s + 50].T)  # (14, 50)
            ys.append(min(ruls[s + 49], 125) / 125.0)
    return (np.asarray(xs, np.float32), np.asarray(ys, np.float32)[:, None])


@pytest.mark.slow
def test_fc_stgnn_20_epoch_equivalence():
    torch = pytest.importorskip("torch")
    patch_torch_cuda()
    from models.FC_STGNN.Model import FC_STGNN_RUL

    x_np, y_np = _synthetic_cmapss()
    n = (x_np.shape[0] // 100) * 100  # whole batches only, fixed order
    x_np, y_np = x_np[:n], y_np[:n]
    xt_test, yt_test = x_np[:200], y_np[:200]

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    torch.manual_seed(0)
    ref = FC_STGNN_RUL(**hp)
    ref.positional_encoding.dropout.p = 0.0
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=1e-4)
    mse_t = torch.nn.MSELoss()

    ours = FCSTGNN(**hp, pe_dropout=0.0)
    params, batch_stats = _import_weights(ref.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)

    x_all, y_all = jnp.asarray(x_np), jnp.asarray(y_np)
    n_batches = n // 100

    @jax.jit
    def epoch(params, batch_stats, opt_state):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            xb = jax.lax.dynamic_slice_in_dim(x_all, i * 100, 100)
            yb = jax.lax.dynamic_slice_in_dim(y_all, i * 100, 100)

            def loss_fn(p):
                out, upd = ours.apply(
                    {"params": p, "batch_stats": batch_stats}, xb,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return mse(out, yb), upd["batch_stats"]

            (loss, nbs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, nopt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), nbs, nopt), loss

        carry, losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(n_batches))
        return carry, jnp.mean(losses)

    epochs = 20
    torch_epoch_losses, jax_epoch_losses = [], []
    for _ in range(epochs):
        ref.train()
        tl = []
        for i in range(n_batches):
            xb = torch.tensor(x_np[i * 100:(i + 1) * 100])
            yb = torch.tensor(y_np[i * 100:(i + 1) * 100])
            opt.zero_grad()
            loss = mse_t(ref(xb), yb)
            loss.backward()
            opt.step()
            tl.append(float(loss))
        torch_epoch_losses.append(np.mean(tl))

        (params, batch_stats, opt_state), jl = epoch(
            params, batch_stats, opt_state)
        jax_epoch_losses.append(float(jl))

    # Early epochs track tightly; once the loss is near-converged (~1e-3),
    # compounding fp drift makes relative comparison meaningless, so the
    # tail is held to an absolute band instead.
    np.testing.assert_allclose(jax_epoch_losses[:8], torch_epoch_losses[:8],
                               rtol=0.03)
    np.testing.assert_allclose(jax_epoch_losses, torch_epoch_losses,
                               atol=1e-3)

    # Final eval metrics agree.
    ref.eval()
    with torch.no_grad():
        pred_t = ref(torch.tensor(xt_test)).numpy().reshape(-1)
    pred_j = np.asarray(ours.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(xt_test), train=False)).reshape(-1)

    m_t = our_metrics.calc_metrics(pred_t, yt_test.reshape(-1), 125)
    m_j = our_metrics.calc_metrics(pred_j, yt_test.reshape(-1), 125)
    # Both converge to small denormalized RMSE; they agree within 1 RUL
    # unit (fp drift keeps exact equality out of reach after 20 epochs).
    assert m_t[3] < 10.0 and m_j[3] < 10.0, (m_j, m_t)
    assert abs(m_j[3] - m_t[3]) < 1.0, (m_j, m_t)
