"""GDAGDL: STFT + PCC + node-importance thresholded graph + GAT + autoencoder.

Reference GDAGDL_model (models/GDAGDL/Model.py:66-170): per-patch STFT;
PCC adjacency over freq-bin nodes; node importance = A @ Linear(x); graph
rebuilt as outer product of (importance > 0); 3 GAT layers (dropout 0.5)
with elu; autoencoder (hidden -> /2 -> /4 -> out) with reconstruction aux
loss; LSTM; Linear head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..nn.attention import GraphAttentionLayer
from ..nn.basic import Linear, MLP
from ..nn.recurrent import LSTMLayer
from ..signal.stft import stft_magnitude


def gdagdl_pcc(mag):
    """Reference GDAGDL 'PCC' (models/GDAGDL/Model.py:42-63) — NOT a true
    Pearson matrix: the second bmm operand is ``centered.reshape(bs*T, f, N)``,
    a row-major REINTERPRETATION of the (N, f) block rather than a
    transpose, so the dot products mix scrambled feature vectors (diagonal
    is not 1, values exceed [-1, 1]). Reproduced exactly, including the
    unguarded norm division, because the downstream ``importance > 0``
    adjacency threshold is sensitive to these values."""
    from ..ops.edge_count import record_edges
    b, n, f = mag.shape
    record_edges((b, n, n))
    c = mag - jnp.mean(mag, axis=-1, keepdims=True)
    scrambled = c.reshape(b, f, n)  # the reference's reshape quirk
    dot = jnp.einsum("bnf,bfm->bnm", c, scrambled)
    norms = jnp.sqrt(jnp.sum(c * c, axis=-1))
    return dot / (norms[:, :, None] * norms[:, None, :])


class GDAGDL(nn.Module):
    """Input (B, 1, L) -> (B, 1); (pred, recon_loss) at train."""
    num_patch: int
    patch_size: int
    num_nodes: int
    nperseg: int
    input_dim: int
    gat_layer_dim: Sequence[int]
    lstm_hidden_dim: int
    autoencoder_hidden_dim: int
    autoencoder_out_dim: int
    fused: str = "auto"
    # reference hardcodes 0.5 (models/GDAGDL/Model.py:78); configurable so
    # train-mode aux parity can be checked deterministically
    attn_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        t = self.num_patch
        flat = x.reshape(b * t, self.patch_size)
        mag = stft_magnitude(flat, self.nperseg)  # (B*T, bins, frames)
        n, f = mag.shape[-2], mag.shape[-1]

        adj = gdagdl_pcc(mag)  # (B*T, N, N)

        importance = Linear(1, name="node_importance_linear")(mag)
        importance = jnp.einsum("...nm,...mo->...no", adj, importance)[..., 0]
        high = (importance > 0).astype(x.dtype)
        adj = high[..., :, None] * high[..., None, :]

        h = mag
        for i, out_dim in enumerate(self.gat_layer_dim):
            h = GraphAttentionLayer(out_dim, dropout=self.attn_dropout,
                                    fused=self.fused,
                                    name=f"gat{i}")(h, adj, train=train)
            h = nn.elu(h)

        y_o = h.reshape(b, t, -1)  # (B, T, N*dims[-1])

        ah = self.autoencoder_hidden_dim
        enc = MLP([ah, ah // 2, ah // 4, self.autoencoder_out_dim],
                  name="encoder")(y_o)
        dec = MLP([ah // 4, ah // 2, ah, n * self.gat_layer_dim[-1]],
                  name="decoder")(enc)
        recon = jnp.mean((y_o - dec) ** 2)

        lstm_out, _ = LSTMLayer(self.lstm_hidden_dim, name="lstm")(enc)
        pred = Linear(1, name="linear")(lstm_out.reshape(b, -1))

        if train:
            return pred, recon
        return pred
