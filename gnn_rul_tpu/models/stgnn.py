"""STGNN: per-patch gaussian top-k graphs + ChebNet + per-node GRU.

Reference STGNN_model (models/STGNN/Model.py:64-107): patchify ->
``A = topk(exp(-cdist^2))`` per patch -> ChebNet over nodes -> per-node GRU
over patches -> Linear on the full flattened GRU output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear
from ..nn.gnn_blocks import ChebNet
from ..nn.recurrent import GRULayer
from ..ops.graphs import pairwise_sq_dists, topk_mask
from ..ops.windows import patchify


class STGNN(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    patch_size: int
    num_patch: int
    num_nodes: int
    hidden_dim: int
    K: int
    top_k: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        xp = patchify(x, self.num_patch, self.patch_size)  # (B, T, N, P)
        _, t, n, p = xp.shape

        # Gaussian kernel on SQUARED distance (models/STGNN/Model.py:13-16;
        # note exp(-d^2), unlike ASTGCNN's exp(-d)), then row-wise top-k.
        flat = xp.reshape(b * t, n, p)
        sim = jnp.exp(-pairwise_sq_dists(flat))
        adj = sim * topk_mask(sim, self.top_k)

        cheb = ChebNet(self.hidden_dim, self.K, name="chebnet")(flat, adj)

        # (B*T, N, H) -> (B, T, N, H) -> (B, N, T, H) -> (B*N, T, H)
        seq = cheb.reshape(b, t, n, -1)
        seq = jnp.transpose(seq, (0, 2, 1, 3)).reshape(b * n, t, -1)
        gru_out, _ = GRULayer(self.hidden_dim, name="gru")(seq)

        return Linear(1, name="fc")(gru_out.reshape(b, -1))
