"""Algorithm registry: per-method model class + training policy.

Mirrors reference algorithms/algorithms.py:29-658. Every method trains with
Adam(lr, weight_decay) and ``loss = MSE(pred, y) + aux_weight * aux`` where
``aux`` is the model's auxiliary output (graph-regularization for LOGO,
KL for HAGCN, reconstruction for STNet/GDAGDL; RGCNU's std head is dead
code — weight 0, reference algorithms.py:287-290). LOGO_bearing additionally
steps a MultiStepLR([5,10,20,25], 0.5) per *batch* (reference
algorithms.py:618,628 — LOGO's scheduler exists but is never stepped).
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any, Dict, Optional


@dataclasses.dataclass(frozen=True)
class AlgorithmSpec:
    model_cls: Any
    # hparam key holding the aux-loss weight; "__one__" means weight 1.0;
    # "__zero__" means the aux output exists but is unused (RGCNU).
    aux_weight: Optional[str] = None
    # per-batch MultiStepLR([5,10,20,25], 0.5) (LOGO_bearing only).
    per_batch_multistep: bool = False
    # Model exposes a ``fused={auto,on,off}`` constructor flag routing its
    # hot op through the Pallas kernels (ops/pallas/). Only the models
    # whose hot op is the full dot-graph+SpMM chain or a dense GAT panel
    # qualify; LOGO/HierCorrPool consume the adjacency directly (fusion
    # gate / cluster assignment), so an output-fused kernel cannot help.
    supports_fused: bool = False
    # Model exposes a node-sharded aggregation hook (``spmm_fn`` or
    # ``gat_fn`` constructor kwarg — see
    # parallel.graph_partition.spmm_hook_kwargs): its dense (N, N) graph
    # algebra can be split over the mesh's 'model' axis. Covers the full
    # dot-graph chain (FC_STGNN), plain MPNN SpMM (LOGO/HierCorrPool
    # families) and the dense GAT panel (GAT_LSTM/STFA).
    supports_spmm_fn: bool = False


# name -> (module under gnn_rul_tpu.models, class name, spec kwargs)
_TABLE = {
    "FC_STGNN": ("fc_stgnn", "FCSTGNN",
                 {"supports_fused": True, "supports_spmm_fn": True}),
    "HierCorrPool": ("hiercorrpool", "HierCorrPool",
                     {"supports_spmm_fn": True}),
    "LOGO": ("logo", "LOGO",
             {"aux_weight": "theta", "supports_spmm_fn": True}),
    "ASTGCNN": ("astgcnn", "ASTGCNN", {}),
    "STFA": ("stfa", "STFA",
             {"supports_fused": True, "supports_spmm_fn": True}),
    "ST_Conv": ("st_conv", "STConv", {}),
    "HAGCN": ("hagcn", "HAGCN", {"aux_weight": "alpha"}),
    "RGCNU": ("rgcnu", "RGCNU", {"aux_weight": "__zero__"}),
    "STAGNN": ("stagnn", "STAGNN", {"supports_fused": True}),
    "DVGTformer": ("dvgtformer", "DVGTformer", {}),
    "GRU_CM": ("gru_cm", "GRUCM", {}),
    "STGNN": ("stgnn", "STGNN", {}),
    "SAGCN": ("sagcn", "SAGCN", {}),
    "STNet": ("stnet", "STNet", {"aux_weight": "__one__"}),
    "ST_GCN": ("st_gcn", "STGCN", {}),
    "GAT_LSTM": ("gat_lstm", "GATLSTM",
                 {"supports_fused": True, "supports_spmm_fn": True}),
    "GDAGDL": ("gdagdl", "GDAGDL", {"aux_weight": "__one__", "supports_fused": True}),
    "STMSGCN": ("stmsgcn", "STMSGCN", {}),
    "AGCN_TF": ("agcn_tf", "AGCNTF", {}),
    "LOGO_bearing": ("logo_bearing", "LOGOBearing",
                     {"aux_weight": "theta", "per_batch_multistep": True,
                      "supports_spmm_fn": True}),
    "HierCorrPool_bearing": ("hiercorrpool_bearing", "HierCorrPoolBearing",
                             {"supports_spmm_fn": True}),
}


def registered_algorithms():
    return sorted(_TABLE)


def get_algorithm_spec(name: str) -> AlgorithmSpec:
    if name not in _TABLE:
        raise NotImplementedError(f"Algorithm not found: {name}")
    module_name, cls_name, kwargs = _TABLE[name]
    module = importlib.import_module(f"..models.{module_name}", __package__)
    return AlgorithmSpec(getattr(module, cls_name), **kwargs)


def resolve_aux_weight(spec: AlgorithmSpec, train_params: Dict) -> float:
    if spec.aux_weight is None or spec.aux_weight == "__zero__":
        return 0.0
    if spec.aux_weight == "__one__":
        return 1.0
    return float(train_params[spec.aux_weight])
