"""FC_STGNN forward parity: identical weights -> outputs allclose vs the
mounted torch reference (eval mode, fp32)."""

import sys

import numpy as np
import pytest

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
    """torch state_dict -> (params, batch_stats) for our FCSTGNN."""
    params = {
        "nonlin_map": {
            "conv1": {"Conv_0": conv1d(sd, "nonlin_map.conv_block1.0")},
            "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
                sd, "nonlin_map.conv_block1.1")}},
            "conv2": {"Conv_0": conv1d(sd, "nonlin_map.conv_block2.0")},
            "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
                sd, "nonlin_map.conv_block2.1")}},
        },
        "nonlin_map2": {"Dense_0": linear(sd, "nonlin_map2.0")},
        "nonlin_map2_bn": {"BatchNorm_0": bn_params(sd, "nonlin_map2.1")},
        "fc1": {"Dense_0": linear(sd, "fc.fc1")},
        "fc2": {"Dense_0": linear(sd, "fc.fc2")},
        "fc3": {"Dense_0": linear(sd, "fc.fc3")},
        "fc4": {"Dense_0": linear(sd, "fc.fc4")},
    }
    batch_stats = {
        "nonlin_map": {
            "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
                sd, "nonlin_map.conv_block1.1")}},
            "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
                sd, "nonlin_map.conv_block2.1")}},
        },
        "nonlin_map2_bn": {"BatchNorm_0": bn_stats(sd, "nonlin_map2.1")},
    }
    for i in (1, 2):
        params[f"mpnn{i}"] = {
            "graph_mapping": {"Dense_0": linear(
                sd, f"MPNN{i}.graph_construction.mapping")},
            "bn_in": {"BatchNorm_0": bn_params(sd, f"MPNN{i}.BN")},
            "theta0": {"Dense_0": linear(sd, f"MPNN{i}.MPNN.theta.0")},
            "bn_out": {"BatchNorm_0": bn_params(sd, f"MPNN{i}.MPNN.bn1")},
        }
        batch_stats[f"mpnn{i}"] = {
            "bn_in": {"BatchNorm_0": bn_stats(sd, f"MPNN{i}.BN")},
            "bn_out": {"BatchNorm_0": bn_stats(sd, f"MPNN{i}.MPNN.bn1")},
        }
    return params, batch_stats


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
