"""HierCorrPool_bearing: HierCorrPool with an STFT front-end.

Reference HierCorrPool_bearing_model (models/HierCorrPool_bearing/
Model.py:6-67); Model_Base is byte-identical to the aero version, so the
trunk is shared via HierCorrPoolCore.
"""

from __future__ import annotations

import flax.linen as nn

from ..signal.stft import stft_magnitude
from .hiercorrpool import HierCorrPoolCore


class HierCorrPoolBearing(nn.Module):
    """Input (B, 1, L) -> (B, 1)."""
    patch_size: int
    num_patch: int
    input_dim: int
    hidden_dim: int
    embedding_dim: int
    num_nodes: int
    nperseg: int
    encoder_conv_kernel: int
    num_nodes_out: int
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        t = self.num_patch
        flat = x.reshape(b * t, self.patch_size)
        mag = stft_magnitude(flat, self.nperseg)  # (B*T, bins, frames)
        n, f = mag.shape[-2], mag.shape[-1]
        xp = mag.reshape(b, t, n, f)

        return HierCorrPoolCore(
            self.hidden_dim, self.embedding_dim, self.encoder_conv_kernel,
            self.num_nodes_out, spmm_fn=self.spmm_fn,
            name="core")(xp, train=train)
