"""LOGO: local-global correlation graphs with GRU-style graph fusion.

Reference LOGO_model (models/LOGO/Model.py:198-262). Pipeline: global
Pearson graph over the raw series + local learned dot-product graph per
patch -> gated fusion of the two adjacencies -> MPNN -> 3-layer
direction-summed Bi-LSTM -> MLP head. Training adds the graph
regularization loss (models/LOGO/Model.py:56-71) weighted by ``theta``.

Reference quirk preserved: the Bi-LSTM is called with input laid out
``(num_node*num_patch, bs, d)`` while batch_first=True (models/LOGO/
Model.py:245-251), so the recurrence actually runs along the BATCH axis
with node-patches as the batch. We reproduce that exact dataflow.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.basic import Linear, Dropout
from ..nn.gnn_blocks import MPNNmk
from ..nn.recurrent import _LSTMParams, bilstm_fused
from ..ops.graphs import pearson_graph, dot_graph_from_mapped


class GraphAttenBlock(nn.Module):
    """GRU-style fusion gate on adjacencies (models/LOGO/Model.py:163-196).

    z = sigmoid(Wzt A_T + Wzg A_G); r = sigmoid(Wrt A_T + Wrg A_G);
    A_hat = tanh(Wht A_G + Wh r); A = (1-z) A_T + z A_hat;
    then -inf diag -> softmax -> +I.
    """
    num_node: int

    @nn.compact
    def __call__(self, a_t, a_g):
        n = self.num_node
        z = jax.nn.sigmoid(Linear(n, name="W_Z_T")(a_t)
                           + Linear(n, name="W_Z_G")(a_g))
        r = jax.nn.sigmoid(Linear(n, name="W_R_T")(a_t)
                           + Linear(n, name="W_R_G")(a_g))
        a_hat = jnp.tanh(Linear(n, name="W_h_T")(a_g)
                         + Linear(n, name="W_h")(r))
        a_final = (1.0 - z) * a_t + z * a_hat
        eye = jnp.eye(n, dtype=a_t.dtype)
        a_final = jax.nn.softmax(a_final - eye * 1e8, axis=-1)
        return a_final + eye


class BiLSTMStandard(nn.Module):
    """3-layer direction-summed Bi-LSTM (models/LOGO/Model.py:75-126).

    Layer widths: [h, 2h, h]; forward/backward outputs are summed after each
    layer; dropout 0.2 after layers 2 and 3 (the reference defines drop1 but
    never applies it); final leaky_relu.
    """
    num_hidden: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = self.num_hidden

        def bi(x, hidden, name):
            # Both directions in one fused scan (same param tree as two
            # LSTMLayers; see nn.recurrent.bilstm_fused).
            pf = _LSTMParams(hidden, name=f"{name}_fwd")(x.shape[-1])
            pb = _LSTMParams(hidden, name=f"{name}_bwd")(x.shape[-1])
            f, b, _ = bilstm_fused(x, pf, pb)
            return f + b

        x = bi(x, h, "bi_lstm1")
        x = bi(x, 2 * h, "bi_lstm2")
        x = Dropout(0.2, name="drop2")(x, train=train)
        x = bi(x, h, "bi_lstm3")
        x = Dropout(0.2, name="drop3")(x, train=train)
        return jax.nn.leaky_relu(x, 0.01)


def graph_regularization_loss(x, adj, gamma: float = 1.0):
    """mean(||x_i - x_j||^2 * A_ij) + gamma * sqrt(mean(A^2))
    (models/LOGO/Model.py:56-71)."""
    diff = x[..., :, None, :] - x[..., None, :, :]
    dist = jnp.sum(diff * diff, axis=-1)
    loss0 = jnp.mean(dist * adj)
    loss1 = jnp.sqrt(jnp.mean(adj * adj))
    return loss0 + gamma * loss1


class LOGOCore(nn.Module):
    """Shared LOGO trunk operating on 4D node features (B, T, N, D) plus a
    per-sample global adjacency (B, N, N). Used by both the aeroengine LOGO
    and the STFT-front-end LOGO_bearing (models/LOGO_bearing/Model.py:263-348,
    identical math after the front-end)."""
    input_dim: int  # D
    hidden_dim: int
    gamma: float = 1.0
    # Node-sharded aggregation hook ((adj, x) -> A @ X over a device mesh;
    # parallel.graph_partition.node_sharded_spmm). Hooks the reference
    # MPNN_mk aggregation (models/LOGO/Model.py:130-160).
    spmm_fn: object = None

    @nn.compact
    def __call__(self, xp, global_corr, train: bool = False):
        b, t, n, d = xp.shape

        nodes = xp.reshape(b * t, n, d)
        mapped = Linear(2 * self.input_dim, name="nonlin_map")(nodes)
        local_corr = dot_graph_from_mapped(mapped)

        g = jnp.broadcast_to(global_corr[:, None], (b, t, n, n))
        g = g.reshape(b * t, n, n)
        fused = GraphAttenBlock(n, name="graph_attn_blk")(local_corr, g)

        mp = MPNNmk(3 * self.input_dim, k=1, spmm_fn=self.spmm_fn,
                    name="MPNN")(mapped, fused)

        # Reference layout quirk: (B, T*N, d) -> transpose(0,1) ->
        # (T*N, B, d) fed to a batch_first LSTM (recurrence over B).
        td = mp.reshape(b, t, n, -1).reshape(b, n * t, -1)
        td = jnp.swapaxes(td, 0, 1)
        td = BiLSTMStandard(3 * self.hidden_dim, name="TD")(td, train=train)
        td = jnp.swapaxes(td, 0, 1)

        feats = td.reshape(b, -1)
        h = nn.relu(Linear(16, name="fc1")(feats))
        h = nn.relu(Linear(8, name="fc2")(h))
        out = Linear(1, name="cls")(h)

        if train:
            gl = graph_regularization_loss(nodes, fused, self.gamma)
            return out, gl
        return out


class LOGO(nn.Module):
    """Input (B, N, L) -> (B, 1); returns (pred, gl_loss) at train."""
    patch_size: int
    num_patch: int
    num_nodes: int
    hidden_dim: int
    gamma: float = 1.0
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        p, t = self.patch_size, self.num_patch

        global_corr = pearson_graph(x)  # (B, N, N)

        xp = x.reshape(b, n, t, p)
        xp = jnp.transpose(xp, (0, 2, 1, 3))  # (B, T, N, P)

        return LOGOCore(p, self.hidden_dim, self.gamma,
                        spmm_fn=self.spmm_fn, name="core")(
            xp, global_corr, train=train)
