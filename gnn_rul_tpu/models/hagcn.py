"""HAGCN: Bi-LSTM node encoder + cosine graph + 3x (GIN + SAGPool top-k).

Reference HAGCN_model (models/HAGCN/Model.py:129-195). Training adds the
summed KL(prior || score) of the three SAGPool layers, weighted by ``alpha``.

Reference quirk preserved: the Bi-LSTM input is transposed to
``(tlen, bs*num_node, patch)`` while batch_first=True
(models/HAGCN/Model.py:157-162), so the recurrence runs along the
``bs*num_node`` axis with patches as batch.

TPU note: SAGPool's top-k gather uses ``jax.lax.top_k`` + take_along_axis
with static k (no boolean indexing / dynamic shapes).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

from ..nn.basic import Linear
from ..models.logo import BiLSTMStandard
from ..ops.graphs import cosine_graph


class GINLayer(nn.Module):
    """``mlp(A X + (1+eps) X)`` with learnable scalar eps
    (models/HAGCN/Model.py:6-24)."""
    hidden_dim: int

    @nn.compact
    def __call__(self, x, adj):
        eps = self.param("eps", nn.initializers.zeros, (1,))
        out = jnp.einsum("...nm,...md->...nd", adj, x) + (1.0 + eps[0]) * x
        h = nn.relu(Linear(self.hidden_dim, name="mlp0")(out))
        return Linear(self.hidden_dim, name="mlp1")(h)


class SAGPool(nn.Module):
    """Score-based top-k pooling with KL(prior||score) aux loss
    (models/HAGCN/Model.py:75-120)."""
    output_dim: int
    n: int

    @nn.compact
    def __call__(self, x, adj):
        ax = jnp.einsum("...nm,...md->...nd", adj, x)
        x_out = jax.nn.leaky_relu(Linear(self.output_dim, name="model")(ax),
                                  0.01)

        # prior P = softmax(mlp(X), axis=1)
        d = x.shape[-1]
        h = nn.relu(Linear(d // 2, name="mlp0")(x))
        p = jax.nn.softmax(Linear(1, name="mlp1")(h), axis=1)[..., 0]

        score = jax.nn.softmax(Linear(1, name="rank")(ax), axis=1)[..., 0]

        # F.kl_div(P.log(), score, 'batchmean') =
        #   sum(score * (log score - log P)) / batch
        kl = jnp.sum(xlogy(score, score) - score * jnp.log(p)) / x.shape[0]

        _, topk = jax.lax.top_k(score, self.n)  # (B, n), descending
        x_sel = jnp.take_along_axis(x_out, topk[..., None], axis=1)
        a_rows = jnp.take_along_axis(adj, topk[..., None], axis=1)
        a_sel = jnp.take_along_axis(a_rows, topk[..., None, :], axis=2)
        return x_sel, a_sel, kl


class HAGCN(nn.Module):
    """Input (B, N, L) -> (B, 1); (pred, kl_sum) at train."""
    patch_size: int
    num_patch: int
    encoder_hidden_dim: int
    hidden_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        t, p = self.num_patch, self.patch_size

        xp = x.reshape(b, n, t, p)  # (B, N, T, P)
        seq = xp.reshape(b * n, t, p)
        # Reference quirk: transpose(1,0) before a batch_first LSTM.
        seq = jnp.swapaxes(seq, 0, 1)  # (T, B*N, P)
        td = BiLSTMStandard(self.encoder_hidden_dim, name="TD")(
            seq, train=train)
        td = jnp.swapaxes(td, 0, 1).reshape(b, n, t, -1)
        td = jnp.swapaxes(td, 1, 2)  # (B, T, N, H)

        nodes = td.reshape(b * t, n, -1)
        adj0 = cosine_graph(nodes, eps=1e-12)

        g1 = GINLayer(self.hidden_dim, name="gin1")(nodes, adj0)
        out1, a1, kl1 = SAGPool(self.hidden_dim, 10, name="gnn1")(g1, adj0)
        g2 = GINLayer(self.hidden_dim, name="gin2")(out1, a1)
        out2, a2, kl2 = SAGPool(self.hidden_dim, 5, name="gnn2")(g2, a1)
        g3 = GINLayer(self.hidden_dim, name="gin3")(out2, a2)
        out3, _, kl3 = SAGPool(self.hidden_dim, 1, name="gnn3")(g3, a2)

        m1 = jnp.mean(out1, axis=1)
        m2 = jnp.mean(out2, axis=1)
        m3 = jnp.mean(out3, axis=1)
        cat = jnp.concatenate([m1, m2, m3], axis=-1).reshape(b, -1)

        h = nn.relu(Linear(self.output_dim, name="fc0")(cat))
        out = Linear(1, name="fc1")(h)

        if train:
            return out, kl1 + kl2 + kl3
        return out
