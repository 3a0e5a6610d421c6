"""ASTGCNN: TCN + tanh gating + gaussian graph + ChebNet.

Reference ASTGCNN_model (models/ASTGCNN/Model.py:233-254):
TCN over sensors-as-channels -> gate ``tanh(Linear(x))*tcn_out`` ->
``A = exp(-cdist(Px, Px))`` -> ChebNet -> mean over nodes -> Linear.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..nn.basic import Linear
from ..nn.gnn_blocks import ChebNet
from ..nn.init import torch_linear_kernel
from ..nn.tcn import TemporalConvNet
from ..ops.graphs import gaussian_graph


class ASTGCNN(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    num_nodes: int
    time_length: int
    encoder_out_dim: int
    output_dim: int
    K: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        tcn_out = TemporalConvNet(self.num_nodes, 6, name="tcn")(
            x, train=train)

        # GatingMechanism (models/ASTGCNN/Model.py:169-181): the module has
        # both a Linear bias and an extra zero-initialized bias parameter.
        theta = Linear(self.encoder_out_dim, name="gate_theta")(x)
        extra_bias = self.param("gate_bias", nn.initializers.zeros,
                                (self.encoder_out_dim,))
        gated = jnp.tanh(theta + extra_bias) * tcn_out

        # construct_graph (:184-195): projection WITHOUT bias, then
        # exp(-euclidean cdist).
        px = nn.Dense(self.encoder_out_dim, use_bias=False,
                      kernel_init=torch_linear_kernel,
                      name="distance_P")(gated)
        adj = gaussian_graph(px)

        cheb = ChebNet(self.output_dim, self.K, name="chebnet")(gated, adj)
        pooled = jnp.mean(cheb, axis=1)
        return Linear(1, name="fc")(pooled)
