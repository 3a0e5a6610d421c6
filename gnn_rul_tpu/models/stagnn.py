"""STAGNN: thresholded-covariance graph + (GCN, GAT) x2 + (TCN, temporal attention) x2.

Reference STAGNN_model (models/STAGNN/Model.py:181-227). Note: after the
GCN/GAT stack the node-feature axis plays the role of the TCN length axis,
so the final flatten is (hidden_dim * output_dim).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import GAT
from ..nn.basic import Linear
from ..nn.gnn_blocks import GCNLayer
from ..nn.tcn import TemporalConvNet
from ..ops.graphs import covariance_threshold_graph


class MultiHeadTemporalEncoder(nn.Module):
    """Per-head: softmax(sigmoid(Linear(x^T))) over L, reweight x; mean over
    heads (models/STAGNN/Model.py:161-177)."""
    num_heads: int

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L)
        outs = []
        xt = jnp.swapaxes(x, -1, -2)  # (B, L, C)
        for i in range(self.num_heads):
            w = jax.nn.sigmoid(Linear(1, name=f"linear_{i}")(xt))  # (B, L, 1)
            w = jax.nn.softmax(jnp.swapaxes(w, -1, -2), axis=-1)  # (B, 1, L)
            outs.append(w * x)
        return jnp.mean(jnp.stack(outs, axis=0), axis=0)


class STAGNN(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    num_nodes: int
    time_length: int
    hidden_dim: int
    output_dim: int
    num_heads: int
    threshold: float
    fused: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        adj = covariance_threshold_graph(x, self.threshold)

        h = GCNLayer(self.hidden_dim, name="gcn1")(x, adj)
        h = GAT(self.hidden_dim, self.num_heads, fused=self.fused,
                name="gat1")(h, adj, train=train)
        h = GCNLayer(self.hidden_dim, name="gcn2")(h, adj)
        h = GAT(self.hidden_dim, self.num_heads, fused=self.fused,
                name="gat2")(h, adj, train=train)

        h = TemporalConvNet(self.hidden_dim, 2, name="tcn1")(h, train=train)
        h = MultiHeadTemporalEncoder(self.num_heads,
                                     name="temporal_encoder1")(h)
        h = TemporalConvNet(self.output_dim, 2, name="tcn2")(h, train=train)
        h = MultiHeadTemporalEncoder(self.num_heads,
                                     name="temporal_encoder2")(h)

        return Linear(1, name="fc")(h.reshape(b, -1))
