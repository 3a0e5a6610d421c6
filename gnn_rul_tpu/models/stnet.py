"""STNet: STFT spectrogram graph + ChebNet stack + autoencoder + LSTM.

Reference STNet_model (models/STNet/Model.py:43-170): per-patch STFT, freq
bins as nodes; adjacency = outer product of the (>0.7)-thresholded CNN node
score; ChebNet chain [input_dim, 300, 200, 100] (K=3); MLP autoencoder with
reconstruction aux loss; LSTM over patch codes; Linear head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear, Conv2d, MLP
from ..nn.gnn_blocks import ChebNet
from ..nn.recurrent import LSTMLayer
from ..signal.stft import stft_magnitude
from ..ops.edge_count import record_edges


class STNet(nn.Module):
    """Input (B, 1, L) -> (B, 1); (pred, recon_loss) at train."""
    num_patch: int
    patch_size: int
    num_nodes: int
    nperseg: int
    input_dim: int
    Cheb_layers: Sequence[int]
    lstm_hidden_dim: int
    autoencoder_hidden_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        flat = x.reshape(b * self.num_patch, self.patch_size)
        mag = stft_magnitude(flat, self.nperseg)  # (B*T, bins, frames)
        n, f = mag.shape[-2], mag.shape[-1]
        xg = mag.reshape(b, self.num_patch, n, f)
        t = self.num_patch

        # Node score: Conv2d(2->1, k=1) on (mean, max) features (:110-133).
        mean_v = jnp.mean(xg, axis=-1, keepdims=True)
        max_v = jnp.max(xg, axis=-1, keepdims=True)
        node_feats = jnp.concatenate([mean_v, max_v], axis=-1)  # (B, T, N, 2)
        weights = Conv2d(1, (1, 1), name="cnn")(
            jnp.transpose(node_feats, (0, 3, 1, 2)))[:, 0]  # (B, T, N)
        high = (weights > 0.7).astype(x.dtype)
        record_edges(high.shape + (high.shape[-1],))
        adj = high[..., :, None] * high[..., None, :]
        adj = jnp.clip(adj, None, 1.0)

        h = xg.reshape(b * t, n, f)
        adj = adj.reshape(b * t, n, n)
        dims = list(self.Cheb_layers)
        for i, out_dim in enumerate(dims):
            h = ChebNet(out_dim, 3, name=f"chebnet{i}")(h, adj)

        y_o = h.reshape(b, t, -1)  # (B, T, N*dims[-1])

        enc = MLP([self.autoencoder_hidden_dim] * 4, name="encoder")(y_o)
        dec = MLP([self.autoencoder_hidden_dim] * 3 + [n * dims[-1]],
                  name="decoder")(enc)
        recon = jnp.mean((y_o - dec) ** 2)

        lstm_out, _ = LSTMLayer(self.lstm_hidden_dim, name="lstm")(enc)
        pred = Linear(1, name="linear")(lstm_out.reshape(b, -1))

        if train:
            return pred, recon
        return pred
