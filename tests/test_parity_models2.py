"""Forward parity vs the torch reference — remaining aeroengine models."""

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


def _tcn_params(sd, prefix, has_downsample=False):
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


def _bilstm_standard(sd, prefix):
    out = {}
    for i in (1, 2, 3):
        out[f"bi_lstm{i}_fwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}")
        out[f"bi_lstm{i}_bwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}",
                                            reverse=True)
    return out


def _check(ours, variables, ref, x, atol=5e-4, rtol=1e-3, train=False):
    import torch
    with torch.no_grad():
        out = ref(torch.tensor(x))
        want = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ours.apply(variables, jnp.asarray(x), train=train)
    got = np.asarray(got[0] if isinstance(got, tuple) else got)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


def test_astgcnn_parity():
    import torch
    from models.ASTGCNN.Model import ASTGCNN_model
    from gnn_rul_tpu.models.astgcnn import ASTGCNN

    hp = hparams.model_hparams("CMAPSS", "FD001", "ASTGCNN")
    torch.manual_seed(0)
    ref = ASTGCNN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "tcn": _tcn_params(sd, "tcn"),
        "gate_theta": {"Dense_0": linear(sd, "gate.theta")},
        "gate_bias": t2n(sd["gate.bias"]),
        "distance_P": {"kernel": t2n(sd["distance_module.P.weight"]).T},
        "chebnet": {"filters": t2n(sd["chebnet.filters"])},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    batch_stats = {"tcn": _tcn_stats(sd, "tcn")}
    x = np.random.default_rng(0).normal(size=(3, 14, 50)).astype(np.float32)
    _check(ASTGCNN(**hp), {"params": params, "batch_stats": batch_stats},
           ref, x)


def test_st_conv_parity():
    import torch
    from models.ST_Conv.Model import ST_Conv_model
    from gnn_rul_tpu.models.st_conv import STConv

    hp = hparams.model_hparams("CMAPSS", "FD001", "ST_Conv")
    torch.manual_seed(0)
    ref = ST_Conv_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "gcn_layer_1": {"theta0": {"Dense_0": linear(
            sd, "gcn_layer_1.theta.0")}},
        "cnn_layer_1": {"conv": conv1d(sd, "cnn_layer_1.conv"),
                        "bn": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
                            sd, "cnn_layer_1.bn")}}},
        "tcn_layer_1": _tcn_params(sd, "tcn_layer_1"),
        "theta1": t2n(sd["theta1"]), "theta2": t2n(sd["theta2"]),
        "theta3": t2n(sd["theta3"]), "theta4": t2n(sd["theta4"]),
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    batch_stats = {
        "cnn_layer_1": {"bn": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, "cnn_layer_1.bn")}}},
        "tcn_layer_1": _tcn_stats(sd, "tcn_layer_1"),
    }
    x = np.random.default_rng(1).normal(size=(3, 14, 50)).astype(np.float32)
    _check(STConv(**hp), {"params": params, "batch_stats": batch_stats},
           ref, x)


def test_hiercorrpool_parity():
    import torch
    from models.HierCorrPool.Model import HierCorrPool_model
    from gnn_rul_tpu.models.hiercorrpool import HierCorrPool

    hp = hparams.model_hparams("CMAPSS", "FD001", "HierCorrPool")
    torch.manual_seed(0)
    ref = HierCorrPool_model(**hp)
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
    x = np.random.default_rng(2).normal(size=(3, 14, 50)).astype(np.float32)
    _check(HierCorrPool(**hp),
           {"params": {"core": core}, "batch_stats": stats}, ref, x)


def test_hagcn_parity():
    import torch
    from models.HAGCN.Model import HAGCN_model
    from gnn_rul_tpu.models.hagcn import HAGCN

    hp = hparams.model_hparams("CMAPSS", "FD001", "HAGCN")
    torch.manual_seed(0)
    ref = HAGCN_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {"TD": _bilstm_standard(sd, "TD")}
    for i in (1, 2, 3):
        params[f"gin{i}"] = {
            "eps": t2n(sd[f"gin{i}.eps"]),
            "mlp0": {"Dense_0": linear(sd, f"gin{i}.mlp.0")},
            "mlp1": {"Dense_0": linear(sd, f"gin{i}.mlp.2")},
        }
        params[f"gnn{i}"] = {
            "model": {"Dense_0": linear(sd, f"gnn{i}.model")},
            "rank": {"Dense_0": linear(sd, f"gnn{i}.rank")},
            "mlp0": {"Dense_0": linear(sd, f"gnn{i}.mlp.0")},
            "mlp1": {"Dense_0": linear(sd, f"gnn{i}.mlp.2")},
        }
    params["fc0"] = {"Dense_0": linear(sd, "fc.0")}
    params["fc1"] = {"Dense_0": linear(sd, "fc.2")}

    x = np.random.default_rng(3).normal(size=(3, 14, 50)).astype(np.float32)
    _check(HAGCN(**hp), {"params": params}, ref, x)


def test_rgcnu_parity():
    import torch
    from models.RGCNU.Model import RGCNU_model
    from gnn_rul_tpu.models.rgcnu import RGCNU

    hp = hparams.model_hparams("CMAPSS", "FD001", "RGCNU")
    torch.manual_seed(0)
    ref = RGCNU_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "adj_theta1": {"Dense_0": linear(sd, "adj.trainable_theta1")},
        "adj_theta2": {"Dense_0": linear(sd, "adj.trainable_theta2")},
        "gcn1": {"linear": {"Dense_0": linear(sd, "scl.gcn1.linear")}},
        "gcn2": {"linear": {"Dense_0": linear(sd, "scl.gcn2.linear")}},
        "scl_conv": {"Conv_0": conv1d(sd, "scl.conv1d")},
        "tdl_lstm": lstm_layer(sd, "tdl.lstm"),
        "fusion_cnn1": {"Conv_0": conv1d(sd, "fusion.cnn1")},
        "fusion_cnn2": conv1d(sd, "fusion.cnn2"),
        "fusion_fc1": {"Dense_0": linear(sd, "fusion.fc1")},
        "fusion_fc2": {"Dense_0": linear(sd, "fusion.fc2")},
    }
    x = np.random.default_rng(4).normal(size=(4, 14, 50)).astype(np.float32)
    _check(RGCNU(**hp), {"params": params}, ref, x)


def test_gru_cm_parity():
    import torch
    from models.GRU_CM.Model import GRU_CM_model
    from gnn_rul_tpu.models.gru_cm import GRUCM

    hp = hparams.model_hparams("CMAPSS", "FD001", "GRU_CM")
    torch.manual_seed(0)
    ref = GRU_CM_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    params = {
        "input_linear": {"Dense_0": linear(sd, "input_linear")},
        "gnn": {
            "edge_kernel": t2n(sd["gnn.edge_mlp.0.weight"]).T,
            "edge_bias": t2n(sd["gnn.edge_mlp.0.bias"]),
            "node_mlp": {"Dense_0": linear(sd, "gnn.node_mlp.0")},
        },
        "gru": gru_layer(sd, "gru"),
        "output_linear": {"Dense_0": linear(sd, "output_linear")},
    }
    x = np.random.default_rng(5).normal(size=(3, 14, 50)).astype(np.float32)
    _check(GRUCM(**hp), {"params": params}, ref, x)


def test_stfa_parity():
    import torch
    from models.STFA.Model import STFA_model
    from gnn_rul_tpu.models.stfa import STFA

    hp = hparams.model_hparams("CMAPSS", "FD001", "STFA")
    torch.manual_seed(0)
    ref = STFA_model(device="cpu", **hp)
    ref.eval()
    sd = ref.state_dict()

    params = {}
    for i in range(hp["num_heads"]):
        p = f"gat.attention_{i}"
        params[f"attention_{i}"] = {
            "linear": {"Dense_0": linear(sd, f"{p}.linear")},
            "att_kernel": t2n(sd[f"{p}.attention.weight"]).T,
            "att_bias": t2n(sd[f"{p}.attention.bias"]),
        }
    params["v"] = {"Dense_0": linear(sd, "v")}
    params["lstm"] = lstm_layer(sd, "lstm")
    params["fc"] = {"Dense_0": linear(sd, "fc")}

    x = np.random.default_rng(6).normal(size=(3, 14, 50)).astype(np.float32)
    _check(STFA(**hp), {"params": params}, ref, x)


def test_dvgtformer_parity():
    import torch
    from models.DVGTformer.Model import DVGTformer_model
    from gnn_rul_tpu.models.dvgtformer import DVGTformer

    hp = hparams.model_hparams("CMAPSS", "FD001", "DVGTformer")
    torch.manual_seed(0)
    ref = DVGTformer_model(**hp)
    ref.eval()
    sd = ref.state_dict()

    def ln(prefix):
        return {"scale": t2n(sd[f"{prefix}.weight"]),
                "bias": t2n(sd[f"{prefix}.bias"])}

    params = {
        "linear_t": {"Dense_0": linear(sd, "linear_t")},
        "linear_x": {"Dense_0": linear(sd, "linear_x")},
        "t_v": t2n(sd["t_v"]),
        "x_v": t2n(sd["x_v"]),
        "out0": {"Dense_0": linear(sd, "output_layer.0")},
        "out1": {"Dense_0": linear(sd, "output_layer.2")},
    }
    for i in range(hp["num_blocks"]):
        for kind, pre, qk in (("tvgt", "tvgtformer_blocks", "temp"),
                              ("svgt", "svgtformer_blocks", "spat")):
            blk = {}
            for h in range(hp["num_heads"]):
                blk[f"q{h}"] = {"Dense_0": linear(
                    sd, f"{pre}.{i}.linears_Q_{qk}.{h}")}
                blk[f"k{h}"] = {"Dense_0": linear(
                    sd, f"{pre}.{i}.linears_K_{qk}.{h}")}
                blk[f"v{h}"] = {"Dense_0": linear(
                    sd, f"{pre}.{i}.linears_V_{qk}.{h}")}
            blk["W_O"] = {"Dense_0": linear(sd, f"{pre}.{i}.W_O_{qk}")}
            blk["layer_norm1"] = ln(f"{pre}.{i}.layer_norm1_{qk}")
            blk["layer_norm2"] = ln(f"{pre}.{i}.layer_norm2_{qk}")
            blk["ff0"] = {"Dense_0": linear(
                sd, f"{pre}.{i}.feed_forward_{qk}.0")}
            blk["ff1"] = {"Dense_0": linear(
                sd, f"{pre}.{i}.feed_forward_{qk}.2")}
            params[f"{kind}{i}"] = blk

    x = np.random.default_rng(7).normal(size=(3, 14, 50)).astype(np.float32)
    _check(DVGTformer(**hp), {"params": params}, ref, x, atol=1e-3)
