"""LOGO_bearing: LOGO with an STFT front-end over vibration patches.

Reference LOGO_bearing_model (models/LOGO_bearing/Model.py:263-348): per-
patch STFT magnitude (freq bins = graph nodes, frames = node features);
global PCC over the full per-bin spectrogram; then the shared LOGO trunk
(fusion gate, MPNN, batch-axis Bi-LSTM quirk, GL loss).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.graphs import pearson_graph
from ..signal.stft import stft_magnitude
from .logo import LOGOCore


class LOGOBearing(nn.Module):
    """Input (B, 1, L) -> (B, 1); (pred, gl_loss) at train."""
    patch_size: int
    num_patch: int
    input_dim: int
    num_nodes: int
    nperseg: int
    hidden_dim: int
    gamma: float = 1.0
    spmm_fn: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        t = self.num_patch
        flat = x.reshape(b * t, self.patch_size)
        mag = stft_magnitude(flat, self.nperseg)  # (B*T, bins, frames)
        n, f = mag.shape[-2], mag.shape[-1]
        xp = mag.reshape(b, t, n, f)

        # Global PCC over each bin's full spectrogram (B, N, T*f)
        # (reference :307-309: transpose(1,2) then reshape(bs, N, -1)).
        full = jnp.swapaxes(xp, 1, 2).reshape(b, n, -1)
        global_corr = pearson_graph(full)

        return LOGOCore(f, self.hidden_dim, self.gamma,
                        spmm_fn=self.spmm_fn, name="core")(
            xp, global_corr, train=train)
