"""FC-STGNN: fully-connected space-time GNN for RUL.

TPU-native reimplementation of the reference FC_STGNN_RUL
(models/FC_STGNN/Model.py:5-85, Model_Base.py). Pipeline:

  patchify -> per-(sample, patch, node) 1D-CNN encoder + Linear/BN
  -> sinusoidal PE over patches (base 100)
  -> two parallel space-time MPNN blocks (sliding window over patches,
     learned dot-product graph over window*N nodes, decay mask, 1-hop GCN,
     mean-pool over window time)
  -> concat -> 4-layer MLP -> (B, 1)

Everything is one fused jit region; the graph construction + mask + SpMM
runs as batched MXU matmuls (see ops.fused for the Pallas path).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear, BatchNorm1d, Dropout
from ..nn.encoders import FeatureExtractor1DCNNRUL
from ..ops.graphs import dot_graph_from_mapped, leaky_relu
from ..ops.message_passing import spmm
from ..ops.windows import patchify, sliding_time_windows, decay_mask
from ..ops.encoding import sinusoidal_encoding


class GraphConvPoolMPNN(nn.Module):
    """One space-time MPNN scale.

    Reference GraphConvpoolMPNN_block_v6 (models/FC_STGNN/Model_Base.py:175-225):
    sliding windows over the patch axis -> learned dot graph over the
    ``window*N`` space-time nodes -> elementwise decay mask -> BN on inputs ->
    1-hop MPNN (Linear(A @ X) -> BN -> leaky_relu) -> mean pool over window
    time.
    """
    output_dim: int
    num_node: int
    time_window: int
    stride: int
    decay: float = 0.7
    pool: str = "mean"
    # "auto" = measured Pallas/XLA dispatch, "on" = force the fused
    # Pallas kernel, "off" = plain XLA (ops/pallas/fused_gnn.py).
    fused: str = "auto"
    # Aggregation strategy injection: a callable (h, nodes, mask) -> agg
    # overriding the local path — e.g. partial(node_sharded_dot_graph_spmm
    # _masked, mesh=mesh) to shard the space-time node axis over a device
    # mesh (parallel/graph_partition.py). None = single-device paths.
    spmm_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, T, N, F)
        w = sliding_time_windows(x, self.time_window, self.stride)
        b, nw, tw, n, f = w.shape
        nodes = w.reshape(b * nw, tw * n, f)

        # Learned dot-product graph, then decay mask (graph built on raw
        # features; BN happens after, matching reference order :200-208).
        h = Linear(f, name="graph_mapping")(nodes)
        mask = decay_mask(self.num_node, self.time_window, self.decay,
                          dtype=x.dtype)

        nodes = BatchNorm1d(name="bn_in")(nodes, train=train)

        if self.spmm_fn is not None:
            # Node-sharded / ring engine (or any injected strategy).
            agg = self.spmm_fn(h, nodes, mask=mask)
        elif self.fused != "off":
            # Pallas path: graph construction + mask + aggregation fused.
            from ..ops.pallas.fused_gnn import fused_dot_graph_spmm_trainable
            agg = fused_dot_graph_spmm_trainable(h, nodes, mask, self.fused)
        else:
            adj = dot_graph_from_mapped(h) * mask
            agg = spmm(adj, nodes)

        # MPNN_mk_v2 with k=1: Linear(A @ X) -> BN -> leaky_relu.
        out = Linear(self.output_dim, name="theta0")(agg)
        out = BatchNorm1d(name="bn_out")(out, train=train)
        out = leaky_relu(out)

        out = out.reshape(b, nw, tw, n, self.output_dim)
        if self.pool == "mean":
            out = jnp.mean(out, axis=2)
        else:
            out = jnp.max(out, axis=2)
        return out  # (B, nw, N, output_dim)


class FCSTGNN(nn.Module):
    """Flagship aeroengine model. Input (B, num_node, L) -> (B, 1)."""
    patch_size: int
    num_patch: int
    encoder_time_out: int
    encoder_hidden_dim: int
    encoder_out_dim: int
    encoder_conv_kernel: int
    hidden_dim: int
    num_sequential: int
    num_node: int
    num_windows: int
    decay: float = 0.7
    moving_window: Tuple[int, int] = (2, 2)
    stride: Tuple[int, int] = (1, 2)
    pe_dropout: float = 0.1
    fused: str = "auto"
    spmm_fn: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        xp = patchify(x, self.num_patch, self.patch_size)  # (B, T, N, P)
        _, tlen, n, p = xp.shape

        # Per-(sample, patch, node) CNN encoding of the raw patch
        # (reference :55-58): each patch becomes a 1-channel sequence.
        enc_in = xp.reshape(b * tlen * n, 1, p)
        enc = FeatureExtractor1DCNNRUL(
            self.encoder_hidden_dim, self.encoder_out_dim,
            kernel_size=self.encoder_conv_kernel, name="nonlin_map")(
                enc_in, train=train)
        enc = enc.reshape(b * tlen * n, -1)
        enc = Linear(2 * self.hidden_dim, name="nonlin_map2")(enc)
        enc = BatchNorm1d(name="nonlin_map2_bn")(enc, train=train)
        enc = enc.reshape(b, tlen, n, 2 * self.hidden_dim)

        # Positional encoding over the patch axis (base 100, dropout 0.1).
        pe = sinusoidal_encoding(tlen, 2 * self.hidden_dim, base=100.0,
                                 dtype=x.dtype)
        enc = enc + pe[None, :, None, :]
        enc = Dropout(self.pe_dropout, name="pe_dropout")(enc, train=train)

        out1 = GraphConvPoolMPNN(
            self.hidden_dim, self.num_node, self.moving_window[0],
            self.stride[0], self.decay, fused=self.fused,
            spmm_fn=self.spmm_fn, name="mpnn1")(enc, train=train)
        out2 = GraphConvPoolMPNN(
            self.hidden_dim, self.num_node, self.moving_window[1],
            self.stride[1], self.decay, fused=self.fused,
            spmm_fn=self.spmm_fn, name="mpnn2")(enc, train=train)

        feats = jnp.concatenate(
            [out1.reshape(b, -1), out2.reshape(b, -1)], axis=-1)

        h = nn.relu(Linear(2 * self.hidden_dim, name="fc1")(feats))
        h = nn.relu(Linear(2 * self.hidden_dim, name="fc2")(h))
        h = nn.relu(Linear(self.hidden_dim, name="fc3")(h))
        return Linear(1, name="fc4")(h)
