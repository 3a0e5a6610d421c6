"""STFA: fixed prior sensor graph + multi-head GAT + LSTM.

Reference STFA_model (models/STFA/Model.py:81-126) with the hand-coded
14-sensor C-MAPSS prior graph (:61-77). Quirk preserved: the "ASE" weights
are a softmax over a singleton axis, i.e. exactly 1.0 — the global feature
concatenated to the LSTM input is a constant ones vector of length
num_patch (:113-120); the ``v`` projection receives zero gradient but still
exists as a parameter (it matters for weight decay).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import GraphAttentionLayer
from ..nn.basic import Linear
from ..nn.recurrent import LSTMLayer

_CMAPSS_EDGES = [
    (1, 2), (1, 12), (1, 4), (1, 9), (1, 5), (1, 3),
    (2, 4), (2, 7), (2, 8), (2, 13), (3, 14), (3, 13),
    (3, 10), (3, 6), (4, 7), (4, 8), (5, 9), (5, 11),
    (6, 10), (7, 8), (8, 13), (9, 11),
]


def prior_knowledge_graph(dtype=jnp.float32) -> jnp.ndarray:
    """22-edge symmetric prior over the 14 retained C-MAPSS sensors
    (models/STFA/Model.py:61-77)."""
    adj = np.zeros((14, 14))
    for i, j in _CMAPSS_EDGES:
        adj[i - 1, j - 1] = 1.0
        adj[j - 1, i - 1] = 1.0
    return jnp.asarray(adj, dtype=dtype)


class STFA(nn.Module):
    """Input (B, 14, L) -> (B, 1). CMAPSS-only (prior graph is hard-coded)."""
    patch_size: int
    num_patch: int
    num_nodes: int
    hidden_dim: int
    output_dim: int
    encoder_hidden_dim: int
    num_heads: int
    dropout: float
    fused: str = "auto"
    gat_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        t, p = self.num_patch, self.patch_size
        xp = x.reshape(b, n, t, p)
        xp = jnp.transpose(xp, (0, 2, 1, 3)).reshape(b * t, n, p)

        adj = prior_knowledge_graph(dtype=x.dtype)
        heads = [
            GraphAttentionLayer(self.output_dim, self.dropout,
                                fused=self.fused, gat_fn=self.gat_fn,
                                name=f"attention_{i}")(xp, adj, train=train)
            for i in range(self.num_heads)
        ]
        gat_out = nn.relu(jnp.mean(jnp.stack(heads, axis=0), axis=0))

        concat = gat_out.reshape(b, t, -1)  # (B, T, N*out)

        # ASE: softmax over a singleton axis == 1.0 exactly.
        ase = jax.nn.softmax(Linear(1, name="v")(jnp.tanh(concat)), axis=-1)
        global_feature = ase.reshape(b, -1)  # (B, T), all ones
        final = jnp.concatenate(
            [jnp.broadcast_to(global_feature[:, None, :], (b, t, t)), concat],
            axis=-1)

        lstm_out, _ = LSTMLayer(self.encoder_hidden_dim, name="lstm")(final)
        return Linear(1, name="fc")(lstm_out[:, -1, :])
