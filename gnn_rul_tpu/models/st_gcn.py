"""ST_GCN: per-patch 10 handcrafted stats + PCC over feature rows + SG-TCN.

Reference ST_GCN_model (models/ST_GCN/Model.py:197-222): the 10 feature
TYPES become the graph nodes (feature dim = num_patch); 2 residual blocks of
(MPNN over the patch axis + causal TCN + dropout); global max pool over the
feature axis; 2-layer MLP.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear, Dropout
from ..nn.gnn_blocks import MPNNmk
from ..nn.tcn import TemporalConvNet
from ..ops.graphs import pearson_graph
from ..signal.features import st_gcn_features


class SGTCN(nn.Module):
    """Residual (MPNN -> TCN -> dropout) stack (models/ST_GCN/Model.py:176-195)."""
    num_patch: int
    num_layers: int
    dropout: float

    @nn.compact
    def __call__(self, x, adj, train: bool):
        out = x
        for i in range(self.num_layers):
            res = out
            out = MPNNmk(self.num_patch, k=1, name=f"mpnn{i}")(out, adj)
            out = TemporalConvNet(out.shape[-2], 2, name=f"tcn{i}")(
                out, train=train)
            out = Dropout(self.dropout, name=f"drop{i}")(out, train=train)
            out = out + res
        return out


class STGCN(nn.Module):
    """Input (B, 1, L) -> (B, 1). num_layers=2 (constructor default used by
    the hparams bank — SG_TCN's own default of 5 is overridden)."""
    num_patch: int
    patch_size: int
    num_layers: int = 2
    dropout: float = 0.5
    k: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        flat = x.reshape(b * self.num_patch, self.patch_size)
        feats = st_gcn_features(flat).reshape(b, self.num_patch, -1)
        feats = jnp.swapaxes(feats, -1, -2)  # (B, 10, num_patch)

        adj = pearson_graph(feats)
        out = SGTCN(self.num_patch, self.num_layers, self.dropout,
                    name="sg_tcn")(feats, adj, train=train)

        out = jnp.max(out, axis=1)  # global max pool over the 10 features
        out = nn.relu(Linear(self.num_patch, name="fc1")(out))
        return Linear(1, name="fc2")(out)
