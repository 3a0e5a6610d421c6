"""Dense graph-attention layers.

The reference GAT layers materialize all N^2 pairwise concatenations
(e.g. models/STAGNN/Model.py:53-60: ``e = att(cat([Wh_i, Wh_j]))``). Since
the attention projection is linear, we split its kernel ``a = [a1; a2]`` and
compute ``e_ij = leaky_relu(Wh a1 + (Wh a2)^T + b)`` as two rank-1 broadcasts
— identical math, no (B, N^2, 2d) intermediate.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .basic import Linear, Dropout
from .init import torch_linear_kernel, fan_in_bias
from ..ops.edge_count import record_edges


class GraphAttentionLayer(nn.Module):
    """Reference GraphAttentionLayer (models/STAGNN/Model.py:26-60):
    ``h' = (dropout(softmax(e, axis=-1)) * adj) @ Wh``.

    The torch layer stores the attention projection as Linear(2d -> 1); we
    keep the same parameter layout (kernel (2d, 1) + bias (1,)) for
    weight-import parity.
    """
    out_features: int
    dropout: float = 0.0
    negative_slope: float = 0.1
    # GAT_LSTM's copy adds leaky_relu on the output (models/GAT_LSTM/
    # Model.py:100); the STAGNN/STFA/GDAGDL copies return it raw.
    final_leaky_relu: bool = False
    # Fused Pallas path (ops/pallas/fused_gat.py): keeps the (N, N)
    # attention panel in VMEM. "auto" = measured N>=384 TPU crossover,
    # "on" = force the kernel, "off" = plain XLA. Only taken when
    # attention dropout is inactive (eval, or dropout=0) — dropout needs
    # the materialized panel anyway.
    fused: str = "auto"
    # Node-sharded panel hook (parallel.graph_partition.node_sharded_gat):
    # splits the query rows of the dense attention panel over a device
    # mesh. Takes precedence over the fused kernel when set.
    gat_fn: object = None

    @nn.compact
    def __call__(self, h, adj, train: bool = False):
        d = self.out_features
        wh = Linear(d, name="linear")(h)
        kernel = self.param("att_kernel", torch_linear_kernel, (2 * d, 1))
        bias = self.param("att_bias", fan_in_bias(2 * d), (1,))
        a1 = kernel[:d, 0]
        a2 = kernel[d:, 0]
        f1 = wh @ a1
        f2 = wh @ a2
        record_edges(wh.shape[:-1] + (wh.shape[-2],))
        if self.gat_fn is not None:
            drop = self.dropout if train else 0.0
            rng = self.make_rng("dropout") if drop > 0.0 else None
            out = self.gat_fn(wh, f1, f2, adj, bias[0], self.negative_slope,
                              dropout=drop, rng=rng)
            if self.final_leaky_relu:
                return jax.nn.leaky_relu(out, 0.01)
            return out
        if self.fused != "off" and (not train or self.dropout == 0.0):
            from ..ops.pallas.fused_gat import fused_gat_trainable
            out = fused_gat_trainable(wh, f1, f2, adj, bias[0],
                                      self.negative_slope, self.fused)
            if self.final_leaky_relu:
                return jax.nn.leaky_relu(out, 0.01)
            return out
        e = f1[..., :, None] + f2[..., None, :] + bias[0]
        e = jax.nn.leaky_relu(e, self.negative_slope)
        attn = jax.nn.softmax(e, axis=-1)
        attn = Dropout(self.dropout, name="attn_drop")(attn, train=train)
        attn = attn * adj
        out = jnp.einsum("...nm,...md->...nd", attn, wh)
        if self.final_leaky_relu:
            # F.leaky_relu default slope (0.01), NOT the attention alpha.
            out = jax.nn.leaky_relu(out, 0.01)
        return out


class GAT(nn.Module):
    """Multi-head mean-aggregated GAT (models/STAGNN/Model.py:62-73)."""
    out_features: int
    num_heads: int
    dropout: float = 0.0
    fused: str = "auto"

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        heads = [
            GraphAttentionLayer(self.out_features, self.dropout,
                                fused=self.fused,
                                name=f"attention_{i}")(x, adj, train=train)
            for i in range(self.num_heads)
        ]
        return jnp.mean(jnp.stack(heads, axis=0), axis=0)
