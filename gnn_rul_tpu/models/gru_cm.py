"""GRU_CM: per-timestep full-graph edge-MLP message passing + GRU.

Reference GRU_CM_model (models/GRU_CM/Model.py:43-82). The edge MLP over all
N^2 pairs (``relu(Linear(cat[x_i, x_j]))``, reference :22-29) is computed
without materializing the 2f concat: the Linear splits into source/target
halves broadcast into (B, L, N, N, out).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear, Dropout
from ..nn.init import torch_linear_kernel, fan_in_bias
from ..nn.recurrent import GRULayer
from ..ops.edge_count import record_edges


class GNNLayer(nn.Module):
    """Edge MLP + sum aggregation + node MLP (models/GRU_CM/Model.py:6-40).

    The relu-edge panel stays on the XLA path by the r5 retirement
    verdict: a Pallas panel kernel won standalone fp32 (1.35x) but LOST
    end-to-end at every reference shape (XLA fuses the panel into its
    producers/consumers; 95.6k vs 83.9k samples/s) and its bf16 backward
    did not compile — full measurement history in BASELINE.md (kernel
    removed; see git history for ops/pallas/fused_edge_mlp.py).
    """
    output_dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B, L, N, f)
        b, l, n, f = x.shape
        kernel = self.param("edge_kernel", torch_linear_kernel,
                            (2 * f, self.output_dim))
        bias = self.param("edge_bias", fan_in_bias(2 * f),
                          (self.output_dim,))
        # cat([x_i, x_j]) @ W = x_i @ W1 + x_j @ W2
        p1 = jnp.einsum("blnf,fo->blno", x, kernel[:f])
        p2 = jnp.einsum("blnf,fo->blno", x, kernel[f:])
        record_edges(x.shape[:-1] + (x.shape[-2],))
        edge = nn.relu(p1[..., :, None, :] + p2[..., None, :, :] + bias)
        edge_sum = jnp.sum(edge, axis=3)  # sum over j
        node = jnp.concatenate([x, edge_sum], axis=-1)
        return nn.relu(Linear(self.output_dim, name="node_mlp")(node))


class GRUCM(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    num_nodes: int
    time_length: int
    gru_hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, l = x.shape
        hidden_dim = int(self.num_nodes / 2)

        h = jnp.swapaxes(x, 1, 2)[..., None]  # (B, L, N, 1)
        h = Linear(hidden_dim, name="input_linear")(h)
        h = Dropout(0.2, name="dropout1")(h, train=train)

        h = GNNLayer(hidden_dim, name="gnn")(h)
        h = Dropout(0.2, name="dropout2")(h, train=train)

        h = jnp.max(h, axis=2)  # (B, L, hidden)
        h, _ = GRULayer(self.gru_hidden_dim, name="gru")(h)
        h = Dropout(0.2, name="dropout3")(h, train=train)

        return Linear(1, name="output_linear")(h.reshape(b, -1))
