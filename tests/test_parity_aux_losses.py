"""Auxiliary-loss value parity vs the torch reference.

All four non-vanilla aux policies are value-checked directly:
  - LOGO graph-regularization (GL) loss — deterministic (computed before
    any dropout layer)
  - STNet reconstruction loss — deterministic (no dropout at all)
  - HAGCN triple-KL (reference algorithms.py:238-248) — dropout disabled
    on both sides for determinism
  - GDAGDL reconstruction (reference algorithms.py:535-544) — attention
    dropout disabled on both sides

Plus a LOGO_bearing short-trajectory parity that exercises the per-batch
MultiStepLR (reference algorithms.py:618,628).
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams

from parity_utils import (patch_torch_cuda, load_reference_model,
                          import_torch_state_dict)

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def _disable_torch_dropout(ref):
    import torch
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if hasattr(m, "dropout") and isinstance(
                getattr(m, "dropout"), float):
            m.dropout = 0.0  # GDAGDL GAT uses F.dropout(self.dropout)


@pytest.fixture()
def _no_flax_dropout(monkeypatch):
    """Make our Dropout wrapper an identity (train-mode determinism)."""
    from gnn_rul_tpu.nn import basic
    monkeypatch.setattr(basic.Dropout, "__call__",
                        lambda self, x, train=False: x)


def _train_mode_aux(method, dataset, sub_id, x_shape, batch, seed):
    """Returns (ref_aux, our_aux) for a train-mode forward on the same
    weights and input, with dropout disabled on both sides."""
    import torch
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec

    hp = hparams.model_hparams(dataset, sub_id, method)
    ref = load_reference_model(method, hp)
    _disable_torch_dropout(ref)
    ref.train()
    variables = import_torch_state_dict(method, ref.state_dict(), hp)
    ours = get_algorithm_spec(method).model_cls(**hp)

    x = np.random.default_rng(seed).normal(
        size=(batch,) + tuple(x_shape)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), train=True)[1]
    got = ours.apply(variables, jnp.asarray(x), train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)})[1]
    return float(want), float(got)


def test_logo_gl_loss_parity():
    import torch
    from gnn_rul_tpu.models.logo import LOGO

    hp = hparams.model_hparams("CMAPSS", "FD001", "LOGO")
    ref = load_reference_model("LOGO", hp)
    ref.train()
    variables = import_torch_state_dict("LOGO", ref.state_dict(), hp)
    ours = LOGO(**hp)

    x = np.random.default_rng(0).normal(size=(4, 14, 50)).astype(np.float32)
    with torch.no_grad():
        _, gl_want = ref(torch.tensor(x), GL=True)
    _, gl_got = ours.apply(variables, jnp.asarray(x), train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(float(gl_got), float(gl_want), rtol=1e-4)


def test_stnet_recon_loss_parity():
    import torch
    from gnn_rul_tpu.models.stnet import STNet

    hp = hparams.model_hparams("PHM2012", "Condition_1", "STNet")
    ref = load_reference_model("STNet", hp)
    ref.train()
    variables = import_torch_state_dict("STNet", ref.state_dict(), hp)
    ours = STNet(**hp)
    x = np.random.default_rng(1).normal(size=(2, 1, 2560)).astype(np.float32)
    with torch.no_grad():
        pred_w, recon_w = ref(torch.tensor(x), train=True)
    pred_g, recon_g = ours.apply(variables, jnp.asarray(x), train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(float(recon_g), float(recon_w), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pred_g), pred_w.numpy(), atol=1e-3)


def test_hagcn_kl_loss_parity(_no_flax_dropout):
    """HAGCN's aux = kl1+kl2+kl3 over the three SAGPool layers (reference
    models/HAGCN/Model.py:190-194, algorithms.py:238-248)."""
    want, got = _train_mode_aux("HAGCN", "CMAPSS", "FD001", (14, 50),
                                batch=3, seed=2)
    # KL sits downstream of a 3-layer BiLSTM + 3 softmax stages; fp32
    # reassociation between torch and XLA leaves ~0.3% relative slack.
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)


def test_gdagdl_recon_loss_parity(_no_flax_dropout):
    """GDAGDL's aux = autoencoder reconstruction MSE (reference
    models/GDAGDL/Model.py:155-161, algorithms.py:535-544)."""
    want, got = _train_mode_aux("GDAGDL", "PHM2012", "Condition_1",
                                (1, 2560), batch=2, seed=3)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_logo_bearing_per_batch_multistep_trajectory(_no_flax_dropout):
    """7 optimizer steps of LOGO_bearing cross the first MultiStepLR
    milestone (5): losses must track the torch reference, which steps the
    scheduler per BATCH (reference algorithms.py:618,628)."""
    import torch
    import optax
    from gnn_rul_tpu.train.algorithms import (get_algorithm_spec,
                                              resolve_aux_weight)
    from gnn_rul_tpu.train.engine import (make_optimizer,
                                          multistep_lr_schedule, mse)

    method = "LOGO_bearing"
    hp = hparams.model_hparams("PHM2012", "Condition_1", method)
    tp = hparams.train_params("PHM2012", "Condition_1", method)
    spec = get_algorithm_spec(method)
    assert spec.per_batch_multistep
    theta = resolve_aux_weight(spec, tp)
    lr, wd = float(tp["learning_rate"]), float(tp.get("weight_decay", 0.0))

    ref = load_reference_model(method, hp)
    _disable_torch_dropout(ref)
    ref.train()
    variables = import_torch_state_dict(method, ref.state_dict(), hp)
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr, weight_decay=wd)
    sched_t = torch.optim.lr_scheduler.MultiStepLR(opt_t, [5, 10, 20, 25],
                                                   0.5)
    mse_t = torch.nn.MSELoss()

    ours = spec.model_cls(**hp)
    tx = make_optimizer(lr, wd, schedule=multistep_lr_schedule(lr))
    params = variables["params"]
    opt_state = tx.init(params)

    rng = np.random.default_rng(4)
    losses_t, losses_j = [], []
    for step in range(7):
        x = rng.normal(size=(3, 1, 2560)).astype(np.float32)
        y = rng.uniform(size=(3, 1)).astype(np.float32)

        pred, gl = ref(torch.tensor(x), GL=True)
        loss = mse_t(pred, torch.tensor(y)) + theta * gl
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        sched_t.step()  # per batch, as the reference does
        losses_t.append(float(loss))

        def loss_fn(p):
            pred, gl = ours.apply({"params": p}, jnp.asarray(x), train=True,
                                  rngs={"dropout": jax.random.PRNGKey(0)})
            return mse(pred, jnp.asarray(y)) + theta * gl

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)
