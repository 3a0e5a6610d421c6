"""Forward parity vs the mounted torch reference for representative models
covering every shared building block: LSTM stacks (LOGO), GAT + TCN + GCN
(STAGNN), ChebNet + GRU + top-k graphs (STGNN), handcrafted features + GCN
(SAGCN), STFT + ChebNet + autoencoder + LSTM (STNet)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams

from parity_utils import (patch_torch_cuda, linear, conv1d, bn_params,
                          bn_stats, lstm_layer, gru_layer, t2n)

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def _bilstm_standard(sd, prefix):
    """Reference Bi_LSTM_Standard -> our BiLSTMStandard params."""
    out = {}
    for i in (1, 2, 3):
        out[f"bi_lstm{i}_fwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}")
        out[f"bi_lstm{i}_bwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}",
                                            reverse=True)
    return out


def test_logo_parity():
    import torch
    from models.LOGO.Model import LOGO_model
    from gnn_rul_tpu.models.logo import LOGO

    hp = hparams.model_hparams("CMAPSS", "FD001", "LOGO")
    torch.manual_seed(0)
    ref = LOGO_model(**hp)
    ref.eval()
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

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 14, 50)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply({"params": {"core": core}}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def _gat_params(sd, prefix, num_heads):
    heads = {}
    for i in range(num_heads):
        p = f"{prefix}.attention_{i}"
        heads[f"attention_{i}"] = {
            "linear": {"Dense_0": linear(sd, f"{p}.linear")},
            "att_kernel": t2n(sd[f"{p}.attention.weight"]).T,
            "att_bias": t2n(sd[f"{p}.attention.bias"]),
        }
    return heads


def _tcn_params(sd, prefix, has_downsample):
    params = {
        "conv1": {"Conv_0": conv1d(sd, f"{prefix}.conv_block1.0")},
        "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
            sd, f"{prefix}.conv_block1.2")}},
        "conv2": {"Conv_0": conv1d(sd, f"{prefix}.conv_block2.0")},
        "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
            sd, f"{prefix}.conv_block2.2")}},
    }
    if has_downsample:
        params["downsample0"] = {"Conv_0": conv1d(sd, f"{prefix}.downsample0")}
    return params


def _tcn_stats(sd, prefix):
    return {
        "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block1.2")}},
        "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block2.2")}},
    }


def test_stagnn_parity():
    import torch
    from models.STAGNN.Model import STAGNN_model
    from gnn_rul_tpu.models.stagnn import STAGNN

    hp = hparams.model_hparams("CMAPSS", "FD001", "STAGNN")
    torch.manual_seed(0)
    ref = STAGNN_model(**hp)
    ref.eval()
    sd = ref.state_dict()
    nh = hp["num_heads"]

    params = {
        "gcn1": {"linear": {"Dense_0": linear(sd, "gcn1.linear")}},
        "gcn2": {"linear": {"Dense_0": linear(sd, "gcn2.linear")}},
        "gat1": _gat_params(sd, "gat1", nh),
        "gat2": _gat_params(sd, "gat2", nh),
        "tcn1": _tcn_params(sd, "tcn1", has_downsample=True),
        "tcn2": _tcn_params(sd, "tcn2", has_downsample=True),
        "temporal_encoder1": {
            f"linear_{i}": {"Dense_0": linear(
                sd, f"temporal_encoder1.linears.{i}")} for i in range(nh)},
        "temporal_encoder2": {
            f"linear_{i}": {"Dense_0": linear(
                sd, f"temporal_encoder2.linears.{i}")} for i in range(nh)},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    batch_stats = {"tcn1": _tcn_stats(sd, "tcn1"),
                   "tcn2": _tcn_stats(sd, "tcn2")}

    ours = STAGNN(**hp)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 14, 50)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_stgnn_parity():
    import torch
    from models.STGNN.Model import STGNN_model
    from gnn_rul_tpu.models.stgnn import STGNN

    hp = hparams.model_hparams("CMAPSS", "FD001", "STGNN")
    torch.manual_seed(0)
    ref = STGNN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "chebnet": {"filters": t2n(sd["chebnet.filters"])},
        "gru": gru_layer(sd, "gru"),
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    ours = STGNN(**hp)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 14, 50)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_sagcn_parity():
    import torch
    from models.SAGCN.Model import SAGCN_model
    from gnn_rul_tpu.models.sagcn import SAGCN

    hp = hparams.model_hparams("PHM2012", "Condition_1", "SAGCN")
    torch.manual_seed(0)
    ref = SAGCN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "gcn1": {"linear": {"Dense_0": linear(sd, "gcn1.linear")}},
        "proj1": {"linear": {"Dense_0": linear(sd, "proj1.linear")},
                  "project_matrices": {"Dense_0": linear(
                      sd, "proj1.project_matrices")}},
        "proj2": {"linear": {"Dense_0": linear(sd, "proj2.linear")},
                  "project_matrices": {"Dense_0": linear(
                      sd, "proj2.project_matrices")}},
        "attn": {"tanh_layer": {"Dense_0": linear(sd, "attn.tanh_layer")},
                 "softmax_layer": {"Dense_0": linear(
                     sd, "attn.softmax_layer")}},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    ours = SAGCN(**hp)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1, 2560)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_stnet_parity():
    import torch
    from models.STNet.Model import STNet_model
    from gnn_rul_tpu.models.stnet import STNet

    hp = hparams.model_hparams("PHM2012", "Condition_1", "STNet")
    torch.manual_seed(0)
    ref = STNet_model(**hp)
    ref.eval()
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
        "lstm": lstm_layer(sd, "lstm"),
        "linear": {"Dense_0": linear(sd, "linear")},
    }
    for i in range(3):
        params[f"chebnet{i}"] = {"filters": t2n(sd[f"chebnets.{i}.filters"])}

    ours = STNet(**hp)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 1, 2560)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                train=False))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
