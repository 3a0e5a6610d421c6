"""RGCNU: directed learned graph + per-timestep GCN + LSTM + CNN fusion.

Reference RGCNU_model (models/RGCNU/Model.py:93-119). Returns (pred, std) at
train; the std head is dead code in the reference training loss
(algorithms.py:287-290) but is still produced.

Reference quirk preserved: ``A.repeat(L, 1, 1)`` tiles the batch of
adjacencies L times (models/RGCNU/Model.py:108), while X is flattened as
(b*L) with b-major order — so sample b at timestep l is paired with
``A[(b*L + l) % bs]``, not its own adjacency. We reproduce that exact
pairing.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear, Conv1d, Dropout
from ..nn.gnn_blocks import GCNLayer
from ..nn.recurrent import LSTMLayer
from ..ops.edge_count import record_edges


class RGCNU(nn.Module):
    """Input (B, N, L) -> (B, 1) (eval) or ((B,1) pred, (B,1) std) (train)."""
    num_nodes: int
    time_length: int
    hidden_dim: int
    encoder_hidden_dim: int
    kernel_size: int
    alpha: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, l = x.shape

        # adj_construction (:77-90)
        a1 = jnp.tanh(self.alpha * Linear(n, name="adj_theta1")(x))
        a2 = jnp.tanh(self.alpha * Linear(n, name="adj_theta2")(x))
        skew = (jnp.einsum("bnd,bmd->bnm", a1, a2)
                - jnp.einsum("bnd,bmd->bnm", a2, a1))
        record_edges(skew.shape)
        adj = nn.relu(jnp.tanh(self.alpha * skew))  # (B, N, N)

        # A.repeat(L,1,1) pairing: flat index k = b*L + l maps to A[k % B].
        k = jnp.arange(b * l)
        adj_flat = jnp.take(adj, k % b, axis=0)  # (B*L, N, N)

        # SCL (:24-41): per-timestep 2-layer GCN on scalar node features.
        xt = jnp.swapaxes(x, 1, 2).reshape(b * l, n, 1)
        h = nn.relu(GCNLayer(self.hidden_dim, activation="none",
                             name="gcn1")(xt, adj_flat))
        h = nn.relu(GCNLayer(self.hidden_dim, activation="none",
                             name="gcn2")(h, adj_flat))
        h = Dropout(0.5, name="scl_drop")(h, train=train)
        # conv1d hidden->1, k=1 over (B*L, hidden, N)
        h = Conv1d(1, 1, name="scl_conv")(jnp.swapaxes(h, 1, 2))
        spatial = jnp.swapaxes(h.reshape(b, l, n), 1, 2)  # (B, N, L)

        # TDL (:44-51): LSTM over time on (B, L, N).
        temporal, _ = LSTMLayer(self.encoder_hidden_dim, name="tdl_lstm")(
            jnp.swapaxes(spatial, 1, 2))

        # FusionModule (:54-75)
        f = Conv1d(self.encoder_hidden_dim, 1, name="fusion_cnn1")(x)
        m = jnp.swapaxes(f, 1, 2) + temporal  # (B, L, H)
        m = jnp.swapaxes(m, 1, 2)  # (B, H, L)
        # 'same' padding (k=3 odd -> symmetric 1)
        kpad = (self.kernel_size - 1) // 2, self.kernel_size // 2
        mt = jnp.swapaxes(m, -1, -2)
        from ..nn.init import torch_conv_kernel, fan_in_bias
        m2 = nn.Conv(self.encoder_hidden_dim,
                     kernel_size=(self.kernel_size,),
                     padding=[kpad],
                     kernel_init=torch_conv_kernel,
                     bias_init=fan_in_bias(
                         self.encoder_hidden_dim * self.kernel_size),
                     name="fusion_cnn2")(mt)
        m2 = jnp.swapaxes(m2, -1, -2).reshape(b, -1)
        pre = Linear(1, name="fusion_fc1")(m2)
        std = Linear(1, name="fusion_fc2")(m2)

        if train:
            return pre, std
        return pre
