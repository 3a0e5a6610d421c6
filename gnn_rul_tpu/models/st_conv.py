"""ST_Conv: parallel GCN and TCN branches fused by a learned gate.

Reference ST_Conv_model (models/ST_Conv/Model.py:173-222). Quirk preserved:
the forward pass reuses the *layer-1* modules for both gate branches (the
layer-2 modules are constructed but never called — reference :180-182 vs
:205-209), so both branch evaluations share weights and are numerically
identical; the BN running stats simply get updated twice per step, as in
torch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.basic import Linear, BatchNormNCL
from ..nn.gnn_blocks import MPNNmk
from ..nn.init import torch_conv_kernel, fan_in_bias
from ..nn.tcn import TemporalConvNet
from ..ops.graphs import pearson_graph


class CNNLayer(nn.Module):
    """Conv1d(padding='same') -> BN -> ReLU (models/ST_Conv/Model.py:58-71).

    torch 'same' padding for even k pads (k-1)//2 left, k//2 right — we pass
    the asymmetric pair explicitly.
    """
    out_channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel_size
        left, right = (k - 1) // 2, k // 2
        xt = jnp.swapaxes(x, -1, -2)
        y = nn.Conv(self.out_channels, kernel_size=(k,),
                    padding=[(left, right)],
                    kernel_init=torch_conv_kernel,
                    bias_init=fan_in_bias(x.shape[-2] * k),
                    name="conv")(xt)
        y = jnp.swapaxes(y, -1, -2)
        y = BatchNormNCL(name="bn")(y, train=train)
        return nn.relu(y)


def _randn_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


class STConv(nn.Module):
    """Input (B, N, L) -> (B, 1)."""
    num_nodes: int
    time_length: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]

        gcn_layer = MPNNmk(self.time_length, k=1, name="gcn_layer_1")
        cnn_layer = CNNLayer(self.num_nodes, self.kernel_size,
                             name="cnn_layer_1")
        tcn_layer = TemporalConvNet(self.num_nodes, self.kernel_size,
                                    name="tcn_layer_1")

        adj = pearson_graph(x)
        gcn = cnn_layer(gcn_layer(x, adj), train=train)
        tcn = tcn_layer(x, train=train)

        # Branch 2 re-runs the SAME layer-1 modules (reference :205-209).
        adj2 = pearson_graph(x)
        gcn2 = cnn_layer(gcn_layer(x, adj2), train=train)
        tcn2 = tcn_layer(x, train=train)

        t1 = self.param("theta1", _randn_init, (1,))
        t2 = self.param("theta2", _randn_init, (1,))
        t3 = self.param("theta3", _randn_init, (1,))
        t4 = self.param("theta4", _randn_init, (1,))

        combined = jnp.tanh(t1 * tcn + t2 * gcn) * jax.nn.sigmoid(
            t3 * tcn2 + t4 * gcn2)
        residual = combined + x

        return Linear(1, name="fc")(residual.reshape(b, -1))
