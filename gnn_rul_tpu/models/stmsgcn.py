"""STMSGCN: spectral-energy-difference features + multi-scale GCN + GRU.

Reference STMSGCN_model (models/STMSGCN/Model.py:63-112): per-patch SED
features become scalar node values; a chain of GCN layers each rebuilding
the adjacency as ``x x^T`` of the CURRENT features; all scales concatenated;
per-node GRU over patches; mean over nodes; Linear head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear
from ..nn.gnn_blocks import GCNLayer
from ..nn.recurrent import GRULayer
from ..signal.features import sed_features
from ..ops.edge_count import record_edges


class STMSGCN(nn.Module):
    """Input (B, 1, L) -> (B, 1)."""
    num_patch: int
    patch_size: int
    interval: int
    band_width: int
    gcn_dims: Sequence[int]
    gru_hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        t = self.num_patch
        flat = x.reshape(b * t, self.patch_size)
        sed = sed_features(flat, self.interval, self.band_width)
        h = sed[..., None]  # (B*T, N, 1)
        n = h.shape[1]

        outputs = [h]
        for i, out_dim in enumerate(self.gcn_dims):
            record_edges(h.shape[:-1] + (h.shape[-2],))
            adj = jnp.einsum("...nd,...md->...nm", h, h)
            h = GCNLayer(out_dim, name=f"gcn{i}")(h, adj)
            outputs.append(h)

        cat = jnp.concatenate(outputs, axis=-1)  # (B*T, N, sum(dims)+1)
        cat = cat.reshape(b, t, n, -1)
        cat = jnp.swapaxes(cat, 1, 2).reshape(b * n, t, -1)
        gru_out, _ = GRULayer(self.gru_hidden_dim, name="gru")(cat)
        gru_out = gru_out.reshape(b, n, t, -1).mean(axis=1)
        return Linear(1, name="fc")(gru_out.reshape(b, -1))
