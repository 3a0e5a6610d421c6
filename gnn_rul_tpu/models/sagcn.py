"""SAGCN: 40-dim handcrafted features + cosine graph + GCN + projections.

Reference SAGCN_model (models/SAGCN/Model.py:127-162). Input (B, 1, L) or
(B, L) raw vibration signal.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.basic import Linear
from ..nn.gnn_blocks import GCNLayer
from ..ops.graphs import cosine_graph
from ..signal.features import sagcn_features


class GraphProjectionLayer(nn.Module):
    """relu(Linear_f(Linear_nodes(x^T)^T)) (models/SAGCN/Model.py:99-112)."""
    out_features: int
    num_nodes: int

    @nn.compact
    def __call__(self, x):
        xw = Linear(self.num_nodes, name="project_matrices")(
            jnp.swapaxes(x, -1, -2))
        out = Linear(self.out_features, name="linear")(
            jnp.swapaxes(xw, -1, -2))
        return nn.relu(out)


class SelfAttentionLayer(nn.Module):
    """softmax(Linear(tanh(Linear(x^T))))^T (models/SAGCN/Model.py:115-124)."""
    num_nodes: int
    attention_hidden_dim: int

    @nn.compact
    def __call__(self, x):
        s = jnp.tanh(Linear(self.attention_hidden_dim, name="tanh_layer")(
            jnp.swapaxes(x, -1, -2)))
        s = jax.nn.softmax(Linear(self.num_nodes, name="softmax_layer")(s),
                           axis=-1)
        return jnp.swapaxes(s, -1, -2)


class SAGCN(nn.Module):
    """Input (B, 1, L) -> (B, 1)."""
    num_patch: int
    patch_size: int
    gcn_hidden_dim: int
    attention_hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, self.num_patch, self.patch_size)

        feats = sagcn_features(x)  # (B, num_patch, 40)
        adj = cosine_graph(feats, eps=1e-12)

        h = GCNLayer(self.gcn_hidden_dim, activation="relu",
                     name="gcn1")(feats, adj)
        h = GraphProjectionLayer(self.gcn_hidden_dim, self.num_patch,
                                 name="proj1")(h)
        h = GraphProjectionLayer(self.gcn_hidden_dim, self.num_patch,
                                 name="proj2")(h)

        attn = SelfAttentionLayer(self.num_patch, self.attention_hidden_dim,
                                  name="attn")(h)
        h = h * attn
        return Linear(1, name="fc")(h.reshape(b, -1))
