"""HierCorrPool: CNN time-preprocessing + correlation graph + cluster pooling.

Reference HierCorrPool_model (models/HierCorrPool/Model.py:6-52,
Model_Base.py). Patches are flattened into (B, patch*N) channel rows, run
through a 3-block strided CNN, regrouped as (B, N, eck*embedding) node
features (the reshape crosses the time/channel axes exactly as the
reference's ``reshape([bs, eck, N, -1])`` does), then: unparameterized dot
graph -> soft cluster-assignment pooling -> MPNN -> MLP head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.basic import Linear
from ..nn.encoders import FeatureExtractor1DCNN
from ..nn.gnn_blocks import MPNNmk
from ..ops.graphs import dot_graph


class ClusterAssignment(nn.Module):
    """Soft cluster-assignment matrix (models/HierCorrPool/Model_Base.py:102-117):
    ``S = softmax(W [A ; sigmoid(Lin(A X))], axis=-2)``."""
    hidden_dim: int
    out_nodes: int
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, adj):
        if self.spmm_fn is not None:
            ax = self.spmm_fn(adj, x)
        else:
            ax = jnp.einsum("...nm,...md->...nd", adj, x)
        h = jax.nn.sigmoid(Linear(self.hidden_dim,
                                  name="dimension_mapping")(ax))
        cat = jnp.concatenate([adj, h], axis=-1)
        s = Linear(self.out_nodes, name="matrix")(cat)
        return jax.nn.softmax(s, axis=-2)


class GraphClassificationBlock(nn.Module):
    """Pool then message-pass (models/HierCorrPool/Model_Base.py:122-145):
    ``X' = S^T X``, ``A' = S^T A S``, then 1-hop MPNN."""
    out_dim: int
    out_nodes: int
    spmm_fn: object = None

    @nn.compact
    def __call__(self, adj, x):
        s = ClusterAssignment(self.out_nodes, self.out_nodes,
                              spmm_fn=self.spmm_fn,
                              name="Graph_Clustering")(x, adj)
        st = jnp.swapaxes(s, -1, -2)
        x_pool = jnp.einsum("...kn,...nd->...kd", st, x)
        a_pool = jnp.einsum("...kn,...nm,...mj->...kj", st, adj, s)
        out = MPNNmk(self.out_dim, k=1, spmm_fn=self.spmm_fn,
                     name="Message_Passing")(x_pool, a_pool)
        return a_pool, out


class HierCorrPoolCore(nn.Module):
    """Shared trunk from 4D node features (B, T, N, D): CNN over flattened
    (D*N) channel rows -> regroup -> dot graph -> cluster pool -> MLP head.
    Used by HierCorrPool and HierCorrPool_bearing (byte-identical Model_Base
    per SURVEY; only the front-end differs)."""
    hidden_dim: int
    embedding_dim: int
    encoder_conv_kernel: int
    num_nodes_out: int
    encoder_kernel_size: int = 8
    # Node-sharded aggregation hook ((adj, x) -> A @ X over a device mesh;
    # parallel.graph_partition.node_sharded_spmm). Reference math hooked:
    # models/HierCorrPool/Model_Base.py:66-96 (MPNN) and :102-117 (A X in
    # the cluster-assignment matrix).
    spmm_fn: object = None

    @nn.compact
    def __call__(self, xp, train: bool = False):
        b, t, n, d = xp.shape
        eck = self.encoder_conv_kernel

        flat = xp.reshape(b, t, n * d)
        td_in = jnp.swapaxes(flat, 1, 2)  # (B, D*N, T)
        td_out = FeatureExtractor1DCNN(
            self.hidden_dim * n, kernel_size=self.encoder_kernel_size,
            stride=1, dropout=0.35,
            name="Time_Preprocessing")(td_in, train=train)
        td_out = jnp.swapaxes(td_out, 1, 2)  # (B, T', 4*hid*N)

        # Reference regrouping (Model.py:38-42): flatten (T', C) then regroup
        # as (eck, N, embedding); feature dim = T'*C/(eck*N).
        gc = td_out.reshape(b, eck, n, -1)
        gc = jnp.swapaxes(gc, 1, 2).reshape(b, n, -1)

        adj = dot_graph(gc)
        _, out = GraphClassificationBlock(
            self.embedding_dim * eck * 3, self.num_nodes_out,
            spmm_fn=self.spmm_fn, name="gc1")(adj, gc)

        h = jax.nn.leaky_relu(
            Linear(self.embedding_dim * 3, name="fc_0")(out.reshape(b, -1)),
            0.01)
        return jax.nn.leaky_relu(Linear(1, name="fc_1")(h), 0.01)


class HierCorrPool(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    patch_size: int
    num_patch: int
    input_dim: int
    hidden_dim: int
    embedding_dim: int
    num_nodes: int
    encoder_conv_kernel: int
    num_nodes_out: int
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        t, p = self.num_patch, self.patch_size
        xp = x.reshape(b, n, t, p)
        xp = jnp.transpose(xp, (0, 2, 1, 3))  # (B, T, N, P)
        return HierCorrPoolCore(
            self.hidden_dim, self.embedding_dim, self.encoder_conv_kernel,
            self.num_nodes_out, spmm_fn=self.spmm_fn,
            name="core")(xp, train=train)
