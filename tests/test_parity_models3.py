"""Forward parity vs the torch reference — remaining bearing models."""

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


def _check(ours, variables, ref, x, atol=1e-3, rtol=1e-3):
    import torch
    with torch.no_grad():
        out = ref(torch.tensor(x))
        want = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ours.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(got[0] if isinstance(got, tuple) else got)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def _tcn_params(sd, prefix):
    return {
        "conv1": {"Conv_0": conv1d(sd, f"{prefix}.conv_block1.0")},
        "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
            sd, f"{prefix}.conv_block1.2")}},
        "conv2": {"Conv_0": conv1d(sd, f"{prefix}.conv_block2.0")},
        "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
            sd, f"{prefix}.conv_block2.2")}},
    }


def _tcn_stats(sd, prefix):
    return {
        "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block1.2")}},
        "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block2.2")}},
    }


def _bilstm_standard(sd, prefix):
    out = {}
    for i in (1, 2, 3):
        out[f"bi_lstm{i}_fwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}")
        out[f"bi_lstm{i}_bwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}",
                                            reverse=True)
    return out


def _gat(sd, prefix):
    return {
        "linear": {"Dense_0": linear(sd, f"{prefix}.linear")},
        "att_kernel": t2n(sd[f"{prefix}.attention.weight"]).T,
        "att_bias": t2n(sd[f"{prefix}.attention.bias"]),
    }


def test_st_gcn_parity():
    import torch
    from models.ST_GCN.Model import ST_GCN_model
    from gnn_rul_tpu.models.st_gcn import STGCN

    hp = hparams.model_hparams("PHM2012", "Condition_1", "ST_GCN")
    torch.manual_seed(0)
    ref = ST_GCN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    sg = {}
    stats = {"sg_tcn": {}}
    for i in range(2):
        sg[f"mpnn{i}"] = {"theta0": {"Dense_0": linear(
            sd, f"sg_tcn.layers.{i}.0.theta.0")}}
        sg[f"tcn{i}"] = _tcn_params(sd, f"sg_tcn.layers.{i}.1")
        stats["sg_tcn"][f"tcn{i}"] = _tcn_stats(sd, f"sg_tcn.layers.{i}.1")
    params = {"sg_tcn": sg,
              "fc1": {"Dense_0": linear(sd, "fc1")},
              "fc2": {"Dense_0": linear(sd, "fc2")}}

    x = np.random.default_rng(0).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(STGCN(**hp), {"params": params, "batch_stats": stats}, ref, x)


def test_gat_lstm_parity():
    import torch
    from models.GAT_LSTM.Model import GAT_LSTM_model
    from gnn_rul_tpu.models.gat_lstm import GATLSTM

    hp = hparams.model_hparams("PHM2012", "Condition_1", "GAT_LSTM")
    torch.manual_seed(0)
    ref = GAT_LSTM_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {}
    for i in range(3):
        params[f"gat{i}"] = _gat(sd, f"gat_layers.{i}")
    for i in range(2):
        params[f"lstm{i}"] = lstm_layer(sd, f"lstm_layers.{i}")
    params["fc"] = {"Dense_0": linear(sd, "fc")}

    x = np.random.default_rng(1).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(GATLSTM(**hp), {"params": params}, ref, x)


def test_gdagdl_parity():
    import torch
    from models.GDAGDL.Model import GDAGDL_model
    from gnn_rul_tpu.models.gdagdl import GDAGDL

    hp = hparams.model_hparams("PHM2012", "Condition_1", "GDAGDL")
    torch.manual_seed(0)
    ref = GDAGDL_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    def mlp(prefix, n):
        return {f"Linear_{i}": {"Dense_0": linear(sd, f"{prefix}.{2 * i}")}
                for i in range(n)}

    params = {
        "node_importance_linear": {"Dense_0": linear(
            sd, "node_importance_linear")},
        "encoder": mlp("encoder", 4),
        "decoder": mlp("decoder", 4),
        "lstm": lstm_layer(sd, "lstm"),
        "linear": {"Dense_0": linear(sd, "linear")},
    }
    for i in range(3):
        params[f"gat{i}"] = _gat(sd, f"gat_layers.{i}")

    x = np.random.default_rng(2).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(GDAGDL(**hp), {"params": params}, ref, x)


def test_stmsgcn_parity():
    import torch
    from models.STMSGCN.Model import STMSGCN_model
    from gnn_rul_tpu.models.stmsgcn import STMSGCN

    hp = hparams.model_hparams("PHM2012", "Condition_1", "STMSGCN")
    torch.manual_seed(0)
    ref = STMSGCN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {"gru": gru_layer(sd, "gru_layer.gru"),
              "fc": {"Dense_0": linear(sd, "fc")}}
    for i in range(4):
        params[f"gcn{i}"] = {"linear": {"Dense_0": linear(
            sd, f"gcn_layers.{i}.linear")}}

    x = np.random.default_rng(3).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(STMSGCN(**hp), {"params": params}, ref, x)


def test_agcn_tf_parity():
    import torch
    from models.AGCN_TF.Model import AGCN_TF_model
    from gnn_rul_tpu.models.agcn_tf import AGCNTF

    hp = hparams.model_hparams("PHM2012", "Condition_1", "AGCN_TF")
    torch.manual_seed(0)
    ref = AGCN_TF_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "spa_adj0": {"Dense_0": linear(sd, "attention_spa_adj.0")},
        "spa_adj1": {"Dense_0": linear(sd, "attention_spa_adj.2")},
        "tem_adj0": {"Dense_0": linear(sd, "attention_tem_adj.0")},
        "tem_adj1": {"Dense_0": linear(sd, "attention_tem_adj.2")},
        "spatial_gnn": {"theta0": {"Dense_0": linear(
            sd, "spatial_gnn.theta.0")}},
        "temporal_gnn": {"theta0": {"Dense_0": linear(
            sd, "temporal_gnn.theta.0")}},
        "head0": {
            "W_q": {"Dense_0": linear(sd, "self_attention.heads.0.W_q")},
            "W_k": {"Dense_0": linear(sd, "self_attention.heads.0.W_k")},
            "W_v": {"Dense_0": linear(sd, "self_attention.heads.0.W_v")}},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    x = np.random.default_rng(4).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(AGCNTF(**hp), {"params": params}, ref, x)


def test_logo_bearing_parity():
    import torch
    from models.LOGO_bearing.Model import LOGO_bearing_model
    from gnn_rul_tpu.models.logo_bearing import LOGOBearing

    hp = hparams.model_hparams("PHM2012", "Condition_1", "LOGO_bearing")
    torch.manual_seed(0)
    ref = LOGO_bearing_model(**hp)
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
    x = np.random.default_rng(5).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(LOGOBearing(**hp), {"params": {"core": core}}, ref, x)


def test_hiercorrpool_bearing_parity():
    import torch
    from models.HierCorrPool_bearing.Model import HierCorrPool_bearing_model
    from gnn_rul_tpu.models.hiercorrpool_bearing import HierCorrPoolBearing

    hp = hparams.model_hparams("PHM2012", "Condition_1",
                               "HierCorrPool_bearing")
    torch.manual_seed(0)
    ref = HierCorrPool_bearing_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    tp = {}
    for i in (1, 2, 3):
        tp[f"conv{i}"] = {"Conv_0": conv1d(
            sd, f"Time_Preprocessing.conv_block{i}.0")}
        tp[f"bn{i}"] = {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
            sd, f"Time_Preprocessing.conv_block{i}.1")}}
    core = {
        "Time_Preprocessing": tp,
        "gc1": {
            "Message_Passing": {"theta0": {"Dense_0": linear(
                sd, "gc1.Message_Passing.theta.0")}},
            "Graph_Clustering": {
                "dimension_mapping": {"Dense_0": linear(
                    sd, "gc1.Graph_Clustering.dimension_mapping")},
                "matrix": {"Dense_0": linear(
                    sd, "gc1.Graph_Clustering.matrix")}},
        },
        "fc_0": {"Dense_0": linear(sd, "fc_0")},
        "fc_1": {"Dense_0": linear(sd, "fc_1")},
    }
    stats = {"core": {"Time_Preprocessing": {
        f"bn{i}": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"Time_Preprocessing.conv_block{i}.1")}} for i in (1, 2, 3)}}}
    x = np.random.default_rng(6).normal(size=(2, 1, 2560)).astype(np.float32)
    _check(HierCorrPoolBearing(**hp),
           {"params": {"core": core}, "batch_stats": stats}, ref, x)
