"""Model zoo registry.

``get_model_class(name)`` resolves reference method names (e.g. "FC_STGNN",
"HierCorrPool_bearing") to the corresponding flax module class.
"""

from __future__ import annotations

import importlib

_TABLE = {
    "FC_STGNN": ("fc_stgnn", "FCSTGNN"),
    "HierCorrPool": ("hiercorrpool", "HierCorrPool"),
    "LOGO": ("logo", "LOGO"),
    "ASTGCNN": ("astgcnn", "ASTGCNN"),
    "STFA": ("stfa", "STFA"),
    "ST_Conv": ("st_conv", "STConv"),
    "HAGCN": ("hagcn", "HAGCN"),
    "RGCNU": ("rgcnu", "RGCNU"),
    "STAGNN": ("stagnn", "STAGNN"),
    "DVGTformer": ("dvgtformer", "DVGTformer"),
    "GRU_CM": ("gru_cm", "GRUCM"),
    "STGNN": ("stgnn", "STGNN"),
    "SAGCN": ("sagcn", "SAGCN"),
    "STNet": ("stnet", "STNet"),
    "ST_GCN": ("st_gcn", "STGCN"),
    "GAT_LSTM": ("gat_lstm", "GATLSTM"),
    "GDAGDL": ("gdagdl", "GDAGDL"),
    "STMSGCN": ("stmsgcn", "STMSGCN"),
    "AGCN_TF": ("agcn_tf", "AGCNTF"),
    "LOGO_bearing": ("logo_bearing", "LOGOBearing"),
    "HierCorrPool_bearing": ("hiercorrpool_bearing", "HierCorrPoolBearing"),
}

AEROENGINE_METHODS = ["ASTGCNN", "GRU_CM", "HAGCN", "ST_Conv", "STFA",
                      "RGCNU", "STAGNN", "HierCorrPool", "LOGO",
                      "DVGTformer", "STGNN", "FC_STGNN"]
BEARING_METHODS = ["ST_GCN", "SAGCN", "STNet", "GAT_LSTM", "STMSGCN",
                   "AGCN_TF", "LOGO_bearing", "HierCorrPool_bearing",
                   "GDAGDL"]


def get_model_class(name: str):
    if name not in _TABLE:
        raise NotImplementedError(f"Model not found: {name}")
    module_name, cls_name = _TABLE[name]
    module = importlib.import_module(f".{module_name}", __package__)
    return getattr(module, cls_name)


def available_models():
    return sorted(_TABLE)
