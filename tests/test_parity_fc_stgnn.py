"""FC_STGNN forward parity: identical weights -> outputs allclose vs the
mounted torch reference (eval mode, fp32)."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN

from parity_utils import (patch_torch_cuda, linear, conv1d, bn_params,
                          bn_stats)


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    patch_torch_cuda()
    sys.path.insert(0, "/root/reference")
    from models.FC_STGNN.Model import FC_STGNN_RUL
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    torch.manual_seed(0)
    m = FC_STGNN_RUL(**{
        "patch_size": hp["patch_size"], "num_patch": hp["num_patch"],
        "encoder_time_out": hp["encoder_time_out"],
        "encoder_hidden_dim": hp["encoder_hidden_dim"],
        "encoder_out_dim": hp["encoder_out_dim"],
        "encoder_conv_kernel": hp["encoder_conv_kernel"],
        "hidden_dim": hp["hidden_dim"],
        "num_sequential": hp["num_sequential"],
        "num_node": hp["num_node"], "num_windows": hp["num_windows"]})
    m.eval()
    return m


def _import_weights(sd):
    """torch state_dict -> (params, batch_stats) for our FCSTGNN.

    Thin wrapper over the package-level mapping
    (gnn_rul_tpu.compat.torch_import) kept for the dependent
    per-layer/training parity tests."""
    from gnn_rul_tpu.compat import import_torch_state_dict
    v = import_torch_state_dict("FC_STGNN", sd)
    return v["params"], v["batch_stats"]


def test_forward_parity(ref_model):
    import torch
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    ours = FCSTGNN(**hp)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 14, 50)).astype(np.float32)

    with torch.no_grad():
        want = ref_model(torch.tensor(x)).numpy()

    params, batch_stats = _import_weights(ref_model.state_dict())
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False))

    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
