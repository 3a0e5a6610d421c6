"""Torch-reference weight import: state_dict -> flax variables.

The reference ships trained models as ``checkpoint.pt`` files holding
``{"configs", "hparams", "model_dict": algorithm.state_dict()}``
(reference utils.py:111-120, written at trainer.py:125-126). This module
maps every one of the 21 methods' torch parameter layouts onto our flax
module trees so a reference-trained model can be evaluated (or fine-tuned)
in this framework:

    variables = import_torch_checkpoint("checkpoint.pt", "FC_STGNN",
                                        dataset="CMAPSS", dataset_id="FD001")
    preds = model.apply(variables, x, train=False)

Layout conventions handled here:
  - torch Linear weight (out, in) -> flax Dense kernel (in, out)  [transpose]
  - torch Conv1d (out, in, k)    -> flax Conv (k, in, out)
  - torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)
  - torch BatchNorm weight/bias/running_mean/running_var ->
      params {scale, bias} + batch_stats {mean, var}
  - torch LSTM/GRU weight_ih_l0 (4H|3H, D) -> w_ih (D, 4H|3H) etc.
    (gate order [i,f,g,o] / [r,z,n] preserved)

The parity tests (tests/test_parity_*.py) consume these same mappings, so
every mapping is verified numerically against the mounted reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


# --------------------------------------------------------------- primitives

def t2n(t) -> np.ndarray:
    """torch tensor (or array-like) -> detached numpy COPY.

    A copy, not a view: ``.numpy()`` shares memory with the torch tensor,
    and ``jnp.asarray`` on CPU can be zero-copy — an in-place torch
    optimizer step would silently mutate the "imported" jax params.
    """
    if hasattr(t, "detach"):
        return np.array(t.detach().cpu().numpy())
    return np.array(t)


def linear(sd, prefix):
    """torch Linear -> flax Dense: kernel is W.T."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def conv1d(sd, prefix):
    """torch Conv1d (out, in, k) -> flax Conv (k, in, out)."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def conv2d(sd, prefix):
    """torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def bn_params(sd, prefix):
    return {"scale": t2n(sd[f"{prefix}.weight"]),
            "bias": t2n(sd[f"{prefix}.bias"])}


def bn_stats(sd, prefix):
    return {"mean": t2n(sd[f"{prefix}.running_mean"]),
            "var": t2n(sd[f"{prefix}.running_var"])}


def lstm_layer(sd, prefix, reverse=False):
    """torch nn.LSTM single layer -> our LSTMLayer params.

    torch: weight_ih_l0 (4H, D), weight_hh_l0 (4H, H), bias_ih/hh (4H,).
    Ours: w_ih (D, 4H), w_hh (H, 4H), b_ih, b_hh. Gate order [i,f,g,o]
    matches torch.
    """
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih_l0{sfx}"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh_l0{sfx}"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih_l0{sfx}"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


def gru_layer(sd, prefix, reverse=False):
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih_l0{sfx}"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh_l0{sfx}"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih_l0{sfx}"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


# --------------------------------------------------- shared composite blocks

def bilstm_standard(sd, prefix):
    """Reference Bi_LSTM_Standard (3 direction-summed BiLSTM layers,
    models/LOGO/Model.py:75-126) -> our BiLSTMStandard params."""
    out = {}
    for i in (1, 2, 3):
        out[f"bi_lstm{i}_fwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}")
        out[f"bi_lstm{i}_bwd"] = lstm_layer(sd, f"{prefix}.bi_lstm{i}",
                                            reverse=True)
    return out


def tcn_params(sd, prefix, has_downsample=False):
    """Shared 2-block dilated TCN (e.g. models/ASTGCNN/Model.py:65-146)."""
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


def tcn_stats(sd, prefix):
    return {
        "bn1": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block1.2")}},
        "bn2": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, f"{prefix}.conv_block2.2")}},
    }


def gat_layer(sd, prefix):
    """Reference GraphAttentionLayer -> our GraphAttentionLayer params."""
    return {
        "linear": {"Dense_0": linear(sd, f"{prefix}.linear")},
        "att_kernel": t2n(sd[f"{prefix}.attention.weight"]).T,
        "att_bias": t2n(sd[f"{prefix}.attention.bias"]),
    }


def gat_heads(sd, prefix, num_heads):
    """Multi-head GAT (models/STAGNN/Model.py:62-73)."""
    return {f"attention_{i}": gat_layer(sd, f"{prefix}.attention_{i}")
            for i in range(num_heads)}


def _mlp(sd, prefix, n):
    """nn.Sequential of alternating Linear/activation (stride-2 indices)."""
    return {f"Linear_{i}": {"Dense_0": linear(sd, f"{prefix}.{2 * i}")}
            for i in range(n)}


# ----------------------------------------------------- per-method mappings
# Each returns a flax `variables` dict {"params": ..., [`batch_stats`]: ...}
# for the BARE model state_dict (no "model." prefix).

def _map_fc_stgnn(sd, hp):
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
    return {"params": params, "batch_stats": batch_stats}


def _logo_core(sd):
    return {
        "nonlin_map": {"Dense_0": linear(sd, "nonlin_map")},
        "MPNN": {"theta0": {"Dense_0": linear(sd, "MPNN.theta.0")}},
        "TD": bilstm_standard(sd, "TD"),
        "graph_attn_blk": {
            name: {"Dense_0": linear(sd, f"graph_attn_blk.{name}")}
            for name in ("W_Z_T", "W_Z_G", "W_R_T", "W_R_G", "W_h_T", "W_h")},
        "fc1": {"Dense_0": linear(sd, "fc.fc1")},
        "fc2": {"Dense_0": linear(sd, "fc.fc2")},
        "cls": {"Dense_0": linear(sd, "cls")},
    }


def _map_logo(sd, hp):
    return {"params": {"core": _logo_core(sd)}}


def _map_logo_bearing(sd, hp):
    return {"params": {"core": _logo_core(sd)}}


def _hiercorrpool_core(sd):
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
    return {"params": {"core": core}, "batch_stats": stats}


def _map_hiercorrpool(sd, hp):
    return _hiercorrpool_core(sd)


def _map_hiercorrpool_bearing(sd, hp):
    return _hiercorrpool_core(sd)


def _map_astgcnn(sd, hp):
    params = {
        "tcn": tcn_params(sd, "tcn"),
        "gate_theta": {"Dense_0": linear(sd, "gate.theta")},
        "gate_bias": t2n(sd["gate.bias"]),
        "distance_P": {"kernel": t2n(sd["distance_module.P.weight"]).T},
        "chebnet": {"filters": t2n(sd["chebnet.filters"])},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    return {"params": params, "batch_stats": {"tcn": tcn_stats(sd, "tcn")}}


def _map_st_conv(sd, hp):
    params = {
        "gcn_layer_1": {"theta0": {"Dense_0": linear(
            sd, "gcn_layer_1.theta.0")}},
        "cnn_layer_1": {"conv": conv1d(sd, "cnn_layer_1.conv"),
                        "bn": {"BatchNorm1d_0": {"BatchNorm_0": bn_params(
                            sd, "cnn_layer_1.bn")}}},
        "tcn_layer_1": tcn_params(sd, "tcn_layer_1"),
        "theta1": t2n(sd["theta1"]), "theta2": t2n(sd["theta2"]),
        "theta3": t2n(sd["theta3"]), "theta4": t2n(sd["theta4"]),
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    batch_stats = {
        "cnn_layer_1": {"bn": {"BatchNorm1d_0": {"BatchNorm_0": bn_stats(
            sd, "cnn_layer_1.bn")}}},
        "tcn_layer_1": tcn_stats(sd, "tcn_layer_1"),
    }
    return {"params": params, "batch_stats": batch_stats}


def _map_hagcn(sd, hp):
    params = {"TD": bilstm_standard(sd, "TD")}
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
    return {"params": params}


def _map_rgcnu(sd, hp):
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
    return {"params": params}


def _map_stagnn(sd, hp):
    nh = hp["num_heads"]
    params = {
        "gcn1": {"linear": {"Dense_0": linear(sd, "gcn1.linear")}},
        "gcn2": {"linear": {"Dense_0": linear(sd, "gcn2.linear")}},
        "gat1": gat_heads(sd, "gat1", nh),
        "gat2": gat_heads(sd, "gat2", nh),
        "tcn1": tcn_params(sd, "tcn1", has_downsample=True),
        "tcn2": tcn_params(sd, "tcn2", has_downsample=True),
        "temporal_encoder1": {
            f"linear_{i}": {"Dense_0": linear(
                sd, f"temporal_encoder1.linears.{i}")} for i in range(nh)},
        "temporal_encoder2": {
            f"linear_{i}": {"Dense_0": linear(
                sd, f"temporal_encoder2.linears.{i}")} for i in range(nh)},
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    batch_stats = {"tcn1": tcn_stats(sd, "tcn1"),
                   "tcn2": tcn_stats(sd, "tcn2")}
    return {"params": params, "batch_stats": batch_stats}


def _map_dvgtformer(sd, hp):
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
    return {"params": params}


def _map_gru_cm(sd, hp):
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
    return {"params": params}


def _map_stfa(sd, hp):
    params = {}
    for i in range(hp["num_heads"]):
        params[f"attention_{i}"] = gat_layer(sd, f"gat.attention_{i}")
    params["v"] = {"Dense_0": linear(sd, "v")}
    params["lstm"] = lstm_layer(sd, "lstm")
    params["fc"] = {"Dense_0": linear(sd, "fc")}
    return {"params": params}


def _map_stgnn(sd, hp):
    params = {
        "chebnet": {"filters": t2n(sd["chebnet.filters"])},
        "gru": gru_layer(sd, "gru"),
        "fc": {"Dense_0": linear(sd, "fc")},
    }
    return {"params": params}


def _map_sagcn(sd, hp):
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
    return {"params": params}


def _map_stnet(sd, hp):
    params = {
        "cnn": {"Conv_0": conv2d(sd, "cnn")},
        "encoder": _mlp(sd, "encoder", 4),
        "decoder": _mlp(sd, "decoder", 4),
        "lstm": lstm_layer(sd, "lstm"),
        "linear": {"Dense_0": linear(sd, "linear")},
    }
    for i in range(3):
        params[f"chebnet{i}"] = {"filters": t2n(sd[f"chebnets.{i}.filters"])}
    return {"params": params}


def _map_st_gcn(sd, hp):
    sg = {}
    stats = {"sg_tcn": {}}
    for i in range(2):
        sg[f"mpnn{i}"] = {"theta0": {"Dense_0": linear(
            sd, f"sg_tcn.layers.{i}.0.theta.0")}}
        sg[f"tcn{i}"] = tcn_params(sd, f"sg_tcn.layers.{i}.1")
        stats["sg_tcn"][f"tcn{i}"] = tcn_stats(sd, f"sg_tcn.layers.{i}.1")
    params = {"sg_tcn": sg,
              "fc1": {"Dense_0": linear(sd, "fc1")},
              "fc2": {"Dense_0": linear(sd, "fc2")}}
    return {"params": params, "batch_stats": stats}


def _map_gat_lstm(sd, hp):
    params = {}
    for i in range(len(hp["hidden_dim"])):
        params[f"gat{i}"] = gat_layer(sd, f"gat_layers.{i}")
    for i in range(len(hp["lstm_hidden_dim"])):
        params[f"lstm{i}"] = lstm_layer(sd, f"lstm_layers.{i}")
    params["fc"] = {"Dense_0": linear(sd, "fc")}
    return {"params": params}


def _map_gdagdl(sd, hp):
    params = {
        "node_importance_linear": {"Dense_0": linear(
            sd, "node_importance_linear")},
        "encoder": _mlp(sd, "encoder", 4),
        "decoder": _mlp(sd, "decoder", 4),
        "lstm": lstm_layer(sd, "lstm"),
        "linear": {"Dense_0": linear(sd, "linear")},
    }
    for i in range(len(hp["gat_layer_dim"])):
        params[f"gat{i}"] = gat_layer(sd, f"gat_layers.{i}")
    return {"params": params}


def _map_stmsgcn(sd, hp):
    params = {"gru": gru_layer(sd, "gru_layer.gru"),
              "fc": {"Dense_0": linear(sd, "fc")}}
    for i in range(4):
        params[f"gcn{i}"] = {"linear": {"Dense_0": linear(
            sd, f"gcn_layers.{i}.linear")}}
    return {"params": params}


def _map_agcn_tf(sd, hp):
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
    return {"params": params}


_MAPPERS = {
    "FC_STGNN": _map_fc_stgnn,
    "HierCorrPool": _map_hiercorrpool,
    "LOGO": _map_logo,
    "ASTGCNN": _map_astgcnn,
    "STFA": _map_stfa,
    "ST_Conv": _map_st_conv,
    "HAGCN": _map_hagcn,
    "RGCNU": _map_rgcnu,
    "STAGNN": _map_stagnn,
    "DVGTformer": _map_dvgtformer,
    "GRU_CM": _map_gru_cm,
    "STGNN": _map_stgnn,
    "SAGCN": _map_sagcn,
    "STNet": _map_stnet,
    "ST_GCN": _map_st_gcn,
    "GAT_LSTM": _map_gat_lstm,
    "GDAGDL": _map_gdagdl,
    "STMSGCN": _map_stmsgcn,
    "AGCN_TF": _map_agcn_tf,
    "LOGO_bearing": _map_logo_bearing,
    "HierCorrPool_bearing": _map_hiercorrpool_bearing,
}


def supported_methods():
    return sorted(_MAPPERS)


# ------------------------------------------------------------- public API

def import_torch_state_dict(method: str, state_dict: Dict[str, Any],
                            model_hparams: Optional[Dict] = None,
                            dataset: Optional[str] = None,
                            dataset_id: Optional[str] = None) -> Dict:
    """Map a torch state_dict of the reference model onto our flax
    variables for ``method``. ``model_hparams`` (or (dataset, dataset_id)
    for a hparam-bank lookup) is needed by methods whose layer counts
    depend on hparams (GAT heads, transformer blocks, ...)."""
    if method not in _MAPPERS:
        raise NotImplementedError(f"no torch-import mapping for {method}")
    if model_hparams is None and dataset is not None:
        from ..configs import hparams as bank
        model_hparams = bank.model_hparams(dataset, dataset_id, method)
    # Accept algorithm-level dicts (keys "model.<...>", "mse.<...>") too.
    if any(k.startswith("model.") for k in state_dict):
        state_dict = {k[len("model."):]: v for k, v in state_dict.items()
                      if k.startswith("model.")}
    return _MAPPERS[method](state_dict, model_hparams or {})


def import_torch_checkpoint(path: str, method: str,
                            model_hparams: Optional[Dict] = None,
                            dataset: Optional[str] = None,
                            dataset_id: Optional[str] = None) -> Dict:
    """Load a reference ``checkpoint.pt`` (utils.py:111-120 format:
    {"configs", "hparams", "model_dict"}) and return flax variables."""
    import torch
    # The checkpoint payload we need (model_dict) is plain tensors, so the
    # safe loader works for well-formed reference checkpoints; fall back to
    # full unpickling only when the file carries non-tensor objects (the
    # reference stores its config objects alongside, utils.py:111-120) —
    # the caller is explicitly asking to import that file.
    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return import_torch_state_dict(method, sd, model_hparams=model_hparams,
                                   dataset=dataset, dataset_id=dataset_id)
