"""Auxiliary-loss value parity vs the torch reference.

LOGO's graph-regularization loss is computed before any dropout layer, and
STNet has no dropout at all — so both aux values are deterministic in train
mode and comparable directly. (HAGCN's KL and GDAGDL's reconstruction sit
downstream of active-dropout layers; their math is covered by the eval-mode
forward parity tests.)
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams

from parity_utils import patch_torch_cuda

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def test_logo_gl_loss_parity():
    import torch
    from models.LOGO.Model import LOGO_model
    from gnn_rul_tpu.models.logo import LOGO
    from test_parity_models import _bilstm_standard
    from parity_utils import linear

    hp = hparams.model_hparams("CMAPSS", "FD001", "LOGO")
    torch.manual_seed(0)
    ref = LOGO_model(**hp)
    ref.train()
    sd = ref.state_dict()

    core = {
        "nonlin_map": {"Dense_0": linear(sd, "nonlin_map")},
        "MPNN": {"theta0": {"Dense_0": linear(sd, "MPNN.theta.0")}},
        "TD": _bilstm_standard(sd, "TD"),
        "graph_attn_blk": {
            name: {"Dense_0": linear(sd, f"graph_attn_blk.{name}")}
            for name in ("W_Z_T", "W_Z_G", "W_R_T", "W_R_G", "W_h_T", "W_h")},
        "fc1": {"Dense_0": linear(sd, "fc.fc1")},
        "fc2": {"Dense_0": linear(sd, "fc.fc2")},
        "cls": {"Dense_0": linear(sd, "cls")},
    }
    ours = LOGO(**hp)

    x = np.random.default_rng(0).normal(size=(4, 14, 50)).astype(np.float32)
    with torch.no_grad():
        _, gl_want = ref(torch.tensor(x), GL=True)
    _, gl_got = ours.apply(
        {"params": {"core": core}}, jnp.asarray(x), train=True,
        rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(float(gl_got), float(gl_want), rtol=1e-4)


def test_stnet_recon_loss_parity():
    import torch
    from models.STNet.Model import STNet_model
    from gnn_rul_tpu.models.stnet import STNet
    from parity_utils import linear, t2n

    hp = hparams.model_hparams("PHM2012", "Condition_1", "STNet")
    torch.manual_seed(0)
    ref = STNet_model(**hp)
    ref.train()
    sd = ref.state_dict()

    def mlp(prefix, n):
        return {f"Linear_{i}": {"Dense_0": linear(sd, f"{prefix}.{2 * i}")}
                for i in range(n)}

    params = {
        "cnn": {"Conv_0": {
            "kernel": t2n(sd["cnn.weight"]).transpose(2, 3, 1, 0),
            "bias": t2n(sd["cnn.bias"])}},
        "encoder": mlp("encoder", 4),
        "decoder": mlp("decoder", 4),
        "lstm": {
            "w_ih": t2n(sd["lstm.weight_ih_l0"]).T,
            "w_hh": t2n(sd["lstm.weight_hh_l0"]).T,
            "b_ih": t2n(sd["lstm.bias_ih_l0"]),
            "b_hh": t2n(sd["lstm.bias_hh_l0"]),
        },
        "linear": {"Dense_0": linear(sd, "linear")},
    }
    for i in range(3):
        params[f"chebnet{i}"] = {"filters": t2n(sd[f"chebnets.{i}.filters"])}

    ours = STNet(**hp)
    x = np.random.default_rng(1).normal(size=(2, 1, 2560)).astype(np.float32)
    with torch.no_grad():
        pred_w, recon_w = ref(torch.tensor(x), train=True)
    pred_g, recon_g = ours.apply({"params": params}, jnp.asarray(x),
                                 train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(float(recon_g), float(recon_w), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pred_g), pred_w.numpy(), atol=1e-3)
