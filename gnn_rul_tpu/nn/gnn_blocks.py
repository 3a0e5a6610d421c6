"""Parameterized graph-NN building blocks shared across models."""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .basic import Linear
from ..ops.message_passing import khop_aggregate, chebyshev_terms


class MPNNmk(nn.Module):
    """k-hop MPNN: ``leaky_relu(sum_k Linear_k(A^k X))`` (sum aggregation).

    Reference MPNN_mk (models/LOGO/Model.py:130-160 and 5 other copies).
    """
    out_dim: int
    k: int = 1
    # Aggregation-strategy injection (parallel.graph_partition hooks):
    # (adj, x) -> A @ X with the node axis sharded over a mesh.
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, adj):
        hops = khop_aggregate(adj, x, self.k, spmm_fn=self.spmm_fn)
        out = sum(Linear(self.out_dim, name=f"theta{i}")(h)
                  for i, h in enumerate(hops))
        return jax.nn.leaky_relu(out, 0.01)


class GCNLayer(nn.Module):
    """Symmetric-normalized GCN with self-loops:
    ``leaky_relu(Linear(D^-1/2 (A+I) D^-1/2 X))`` — reference
    models/STAGNN/Model.py:8-22 (identical in RGCNU with a ReLU variant).
    """
    out_features: int
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, adj):
        n = adj.shape[-1]
        a = adj + jnp.eye(n, dtype=adj.dtype)
        d_inv_sqrt = jnp.sum(a, axis=-1) ** -0.5
        a_hat = a * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]
        ax = jnp.einsum("...nm,...md->...nd", a_hat, x)
        out = Linear(self.out_features, name="linear")(ax)
        if self.activation == "leaky_relu":
            return jax.nn.leaky_relu(out, 0.01)
        if self.activation == "relu":
            return nn.relu(out)
        return out


def _xavier_uniform_3d(key, shape, dtype=jnp.float32):
    """torch nn.init.xavier_uniform_ on a (K, in, out) tensor.

    torch's _calculate_fan_in_and_fan_out treats dims 2+ as receptive field:
    fan_in = shape[1] * prod(shape[2:]), fan_out = shape[0] * prod(shape[2:]).
    For (K, in, out): fan_in = in*out, fan_out = K*out.
    """
    k, fin, fout = shape
    bound = np.sqrt(6.0 / (fin * fout + k * fout))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class ChebNet(nn.Module):
    """Chebyshev graph convolution ``sum_k T_k(A) X W_k`` — reference
    models/ASTGCNN/Model.py:198-230 / models/STGNN/Model.py:29-61.

    Parameter layout (K, in, out) with torch xavier_uniform_ init.
    """
    out_channels: int
    K: int

    @nn.compact
    def __call__(self, x, adj):
        in_channels = x.shape[-1]
        filters = self.param("filters", _xavier_uniform_3d,
                             (self.K, in_channels, self.out_channels))
        terms = chebyshev_terms(adj, x, self.K)
        out = sum(jnp.einsum("...nd,de->...ne", t, filters[i])
                  for i, t in enumerate(terms))
        return out
