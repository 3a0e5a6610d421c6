"""GAT_LSTM: 11 handcrafted stats + path graph + 3 GATs + 2 LSTMs.

Reference GAT_LSTM_model (models/GAT_LSTM/Model.py:112-165): tri-diagonal
path adjacency over patches; GAT stack [300, 200, 100] (its GAT copy adds a
final leaky_relu, :100); LSTM stack [30, 20]; Linear on the full flattened
LSTM output.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..nn.attention import GraphAttentionLayer
from ..nn.basic import Linear
from ..nn.recurrent import LSTMLayer
from ..signal.features import gat_lstm_features


def path_graph(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """I + super/sub-diagonal (models/GAT_LSTM/Model.py:145-149)."""
    adj = np.eye(n)
    idx = np.arange(n - 1)
    adj[idx, idx + 1] = 1.0
    adj[idx + 1, idx] = 1.0
    return jnp.asarray(adj, dtype=dtype)


class GATLSTM(nn.Module):
    """Input (B, 1, L) -> (B, 1)."""
    num_patch: int
    patch_size: int
    hidden_dim: Sequence[int]
    lstm_hidden_dim: Sequence[int]
    dropout: float = 0.1
    alpha: float = 0.1
    fused: str = "auto"
    # Node-sharded attention panel (parallel.graph_partition.
    # node_sharded_gat): splits the per-patch GAT rows over a mesh.
    gat_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        flat = x.reshape(b * self.num_patch, self.patch_size)
        feats = gat_lstm_features(flat).reshape(b, self.num_patch, -1)

        adj = path_graph(self.num_patch, dtype=x.dtype)
        h = feats
        for i, out_dim in enumerate(self.hidden_dim):
            h = GraphAttentionLayer(
                out_dim, self.dropout, negative_slope=self.alpha,
                final_leaky_relu=True, fused=self.fused,
                gat_fn=self.gat_fn,
                name=f"gat{i}")(h, adj, train=train)

        for i, hid in enumerate(self.lstm_hidden_dim):
            h, _ = LSTMLayer(hid, name=f"lstm{i}")(h)

        return Linear(1, name="fc")(h.reshape(b, -1))
