"""AGCN_TF: 40-dim features + learned dual (spatial/temporal) adjacencies.

Reference AGCN_TF_model (models/AGCN_TF/Model.py:137-189): MLP-generated
spatial (40x40) and temporal (T x T) adjacencies; two MPNN branches over the
transposed views; concat; multi-head self-attention; Linear head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.basic import Linear
from ..nn.gnn_blocks import MPNNmk
from ..signal.features import sagcn_features
from ..ops.edge_count import record_edges


class SelfAttention(nn.Module):
    """Plain scaled dot-product self-attention
    (models/AGCN_TF/Model.py:104-122)."""
    d_model: int

    @nn.compact
    def __call__(self, h):
        q = Linear(self.d_model, name="W_q")(h)
        k = Linear(self.d_model, name="W_k")(h)
        v = Linear(self.d_model, name="W_v")(h)
        scores = jnp.einsum("...nd,...md->...nm", q, k) / np.sqrt(self.d_model)
        return jnp.einsum("...nm,...md->...nd",
                          jax.nn.softmax(scores, axis=-1), v)


class AGCNTF(nn.Module):
    """Input (B, 1, L) -> (B, 1)."""
    num_patch: int
    patch_size: int
    hidden_adj_dim: int
    hidden_gnn_dim: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        feats = sagcn_features(
            x.reshape(b, self.num_patch, self.patch_size))  # (B, T, 40)

        # A_s: MLP over the transposed view -> (B, 40, 40);
        # A_t: MLP over features -> (B, T, T).
        record_edges(x.shape[:-2] + (40, 40))
        a_s = Linear(40, name="spa_adj1")(jnp.tanh(
            Linear(self.hidden_adj_dim, name="spa_adj0")(
                jnp.swapaxes(feats, -1, -2))))
        record_edges(x.shape[:-2] + (self.num_patch, self.num_patch))
        a_t = Linear(self.num_patch, name="tem_adj1")(jnp.tanh(
            Linear(self.hidden_adj_dim, name="tem_adj0")(feats)))

        h_s = MPNNmk(self.hidden_gnn_dim, k=1, name="spatial_gnn")(
            jnp.swapaxes(feats, 1, 2), a_s)
        h_t = MPNNmk(self.hidden_gnn_dim, k=1, name="temporal_gnn")(feats, a_t)

        h = jnp.concatenate([h_s, h_t], axis=1)  # (B, 40+T, hidden)
        heads = [SelfAttention(self.hidden_gnn_dim, name=f"head{i}")(h)
                 for i in range(self.num_heads)]
        h_attn = jnp.concatenate(heads, axis=-1)
        return Linear(1, name="fc")(h_attn.reshape(b, -1))
