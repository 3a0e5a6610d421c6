"""1D-CNN feature encoders shared across models."""

from __future__ import annotations

import flax.linen as nn

from .basic import Conv1d, BatchNormNCL, max_pool1d, Dropout


class FeatureExtractor1DCNNRUL(nn.Module):
    """2-block 1D-CNN used by FC_STGNN.

    Reference Feature_extractor_1DCNN_RUL (models/FC_STGNN/Model_Base.py:12-41):
      conv1: Conv1d(in, hidden, k, pad k//2, no bias) -> BN -> ReLU -> Dropout(0)
      conv2: Conv1d(hidden, out, k, pad 1, no bias)   -> BN -> ReLU

    Input (B, C_in, L) -> (B, out_dim, L') with L' = L + 2*(k//2) - k + 1
    then L'' = L' + 2 - k + 1.
    """
    num_hidden: int
    out_dim: int
    kernel_size: int = 8

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv1d(self.num_hidden, self.kernel_size,
                   padding=self.kernel_size // 2, use_bias=False,
                   name="conv1")(x)
        x = BatchNormNCL(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = Conv1d(self.out_dim, self.kernel_size, padding=1, use_bias=False,
                   name="conv2")(x)
        x = BatchNormNCL(name="bn2")(x, train=train)
        return nn.relu(x)


class FeatureExtractor1DCNN(nn.Module):
    """3-block 1D-CNN with MaxPool used by HierCorrPool (+bearing variant).

    Reference Feature_extractor_1DCNN (models/HierCorrPool/Model_Base.py:30-64):
      block1: Conv1d(in, hid, k, stride, pad k//2, no bias) -> BN -> ReLU
              -> MaxPool1d(2, 2, pad 1) -> Dropout
      block2: Conv1d(hid, hid*2, 8, pad 4, no bias) -> BN -> ReLU -> MaxPool
      block3: Conv1d(hid*2, hid*4, 8, pad 4, no bias) -> BN -> ReLU -> MaxPool

    Note: the reference constructor's ``output_dimension`` arg is ignored —
    the output channel count is always ``num_hidden * 4``.
    """
    num_hidden: int
    kernel_size: int = 8
    stride: int = 1
    dropout: float = 0.35

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv1d(self.num_hidden, self.kernel_size, stride=self.stride,
                   padding=self.kernel_size // 2, use_bias=False,
                   name="conv1")(x)
        x = BatchNormNCL(name="bn1")(x, train=train)
        x = nn.relu(x)
        x = max_pool1d(x, 2, 2, padding=1)
        x = Dropout(self.dropout)(x, train=train)

        x = Conv1d(self.num_hidden * 2, 8, padding=4, use_bias=False,
                   name="conv2")(x)
        x = BatchNormNCL(name="bn2")(x, train=train)
        x = nn.relu(x)
        x = max_pool1d(x, 2, 2, padding=1)

        x = Conv1d(self.num_hidden * 4, 8, padding=4, use_bias=False,
                   name="conv3")(x)
        x = BatchNormNCL(name="bn3")(x, train=train)
        x = nn.relu(x)
        x = max_pool1d(x, 2, 2, padding=1)
        return x
