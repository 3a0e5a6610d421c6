"""Shared 2-block dilated temporal convolution network.

Reference ``TemporalConvNet`` (models/ASTGCNN/Model.py:72-146, duplicated in
ST_Conv/STAGNN/ST_GCN). The forward path is:

  block1: causal Conv1d(k, dilation 1, pad (k-1), no bias) -> chomp -> BN -> ReLU
          + residual (identity, since in==out in every use)  -> ReLU
  block2: same with dilation 2, pad 2(k-1)                   -> ReLU

Chomp removes the right-side padding, so a causal conv keeps length L. On
TPU we express the causal conv directly with asymmetric padding
[(pad, 0)] instead of pad-then-slice — identical math, no wasted compute.

The weight-normed ``net0/net1`` submodules of the reference are constructed
but never called in forward (dead code) — not reproduced.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from .init import torch_conv_kernel, fan_in_bias
from .basic import BatchNormNCL, Conv1d


class CausalConv1d(nn.Module):
    """Conv1d with left-only padding of (k-1)*dilation (conv+chomp fusion)."""
    features: int
    kernel_size: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L)
        pad = (self.kernel_size - 1) * self.dilation
        fan_in = x.shape[-2] * self.kernel_size
        xt = jnp.swapaxes(x, -1, -2)
        y = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(1,),
            padding=[(pad, 0)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel,
            bias_init=fan_in_bias(fan_in),
        )(xt)
        return jnp.swapaxes(y, -1, -2)


class TemporalConvNet(nn.Module):
    """2-block causal TCN matching the reference forward path.

    Input (B, C_in, L) -> output (B, channels, L). When C_in != channels the
    first residual goes through a 1x1 downsample conv (with bias), matching
    the reference ``downsample0`` (models/ASTGCNN/Model.py:92,138); the
    second block's residual is always identity in every reference
    instantiation (``in_channels1 == out_channels1``).
    """
    channels: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        in_channels = x.shape[-2]
        h = CausalConv1d(self.channels, self.kernel_size, dilation=1,
                         use_bias=False, name="conv1")(x)
        h = BatchNormNCL(name="bn1")(h, train=train)
        h = nn.relu(h)
        if in_channels != self.channels:
            res = Conv1d(self.channels, 1, name="downsample0")(x)
        else:
            res = x
        out0 = nn.relu(h + res)

        h = CausalConv1d(self.channels, self.kernel_size, dilation=2,
                         use_bias=False, name="conv2")(out0)
        h = BatchNormNCL(name="bn2")(h, train=train)
        h = nn.relu(h)
        return nn.relu(h + out0)
