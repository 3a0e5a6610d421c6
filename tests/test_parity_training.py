"""Training-trajectory parity: with identical weights, batches, and no
dropout, N Adam steps in our engine must track the torch reference's losses
and parameters (validates coupled weight decay, Adam bias correction, BN
batch-stat updates, and gradients through the whole stack)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import optax

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
from gnn_rul_tpu.train.engine import make_optimizer, mse

from parity_utils import patch_torch_cuda
from test_parity_fc_stgnn import _import_weights

sys.path.insert(0, "/root/reference")


def test_fc_stgnn_training_trajectory():
    torch = pytest.importorskip("torch")
    patch_torch_cuda()
    from models.FC_STGNN.Model import FC_STGNN_RUL

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    torch.manual_seed(0)
    ref = FC_STGNN_RUL(**hp)
    # disable dropout so both sides are deterministic
    ref.positional_encoding.dropout.p = 0.0
    ref.train()
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3, weight_decay=1e-4)
    mse_t = torch.nn.MSELoss()

    ours = FCSTGNN(**hp, pe_dropout=0.0)
    params, batch_stats = _import_weights(ref.state_dict())
    params = jax.tree_util.tree_map(jnp.asarray, params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, batch_stats)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    steps = 5
    xs = rng.normal(size=(steps, 16, 14, 50)).astype(np.float32)
    ys = rng.uniform(size=(steps, 16, 1)).astype(np.float32)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            out, upd = ours.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return mse(out, y), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    torch_losses, jax_losses = [], []
    for i in range(steps):
        xt = torch.tensor(xs[i])
        yt = torch.tensor(ys[i])
        opt.zero_grad()
        loss_t = mse_t(ref(xt), yt)
        loss_t.backward()
        opt.step()
        torch_losses.append(float(loss_t))

        params, batch_stats, opt_state, loss_j = train_step(
            params, batch_stats, opt_state, jnp.asarray(xs[i]),
            jnp.asarray(ys[i]))
        jax_losses.append(float(loss_j))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4,
                               atol=2e-5)

    # Final parameters must also agree (validates the optimizer math, not
    # just the loss surface).
    final_ref, final_stats = _import_weights(ref.state_dict())
    flat_ours = jax.tree_util.tree_leaves_with_path(params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, final_ref)))
    max_diff = 0.0
    for path, leaf in flat_ours:
        ref_leaf = flat_ref[tuple(path)]
        max_diff = max(max_diff,
                       float(jnp.max(jnp.abs(leaf - ref_leaf))))
    assert max_diff < 5e-4, f"param divergence {max_diff}"

    # Running BN stats track too (momentum convention check).
    flat_bs = jax.tree_util.tree_leaves_with_path(batch_stats)
    flat_bs_ref = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, final_stats)))
    for path, leaf in flat_bs:
        ref_leaf = flat_bs_ref[tuple(path)]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   atol=5e-4, rtol=1e-3)
