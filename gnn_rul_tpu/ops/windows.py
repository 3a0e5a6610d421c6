"""Static windowing / patching utilities.

TPU rule: all window extraction is done with static shapes (strided slices /
reshape), never gather with dynamic indices. Equivalent to the reference's
``F.unfold`` sliding windows and ``reshape``-based patching.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def patchify(x: jnp.ndarray, num_patch: int, patch_size: int) -> jnp.ndarray:
    """``(B, C, L) -> (B, num_patch, C, patch_size)``.

    Matches ``reshape(bs, C, num_patch, patch_size); transpose(1, 2)``
    (reference models/FC_STGNN/Model.py:46-47).
    """
    b, c, _ = x.shape
    x = x.reshape(b, c, num_patch, patch_size)
    return jnp.transpose(x, (0, 2, 1, 3))


def sliding_time_windows(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """``(B, T, N, D) -> (B, num_windows, window, N, D)``.

    Equivalent to the reference ``Conv_GraphST`` (F.unfold over the time axis,
    models/FC_STGNN/Model_Base.py:137-148) followed by the transpose at
    :197 — the output window content is ``x[:, w*stride : w*stride+window]``,
    laid out time-major so each window flattens to ``window*N`` nodes with
    blocks of N per timestep (the layout the decay mask expects).
    """
    t = x.shape[1]
    num_windows = (t - window) // stride + 1
    slices = [x[:, w * stride: w * stride + window] for w in range(num_windows)]
    return jnp.stack(slices, axis=1)


def decay_mask(num_node: int, time_window: int, decay: float,
               dtype=jnp.float32) -> jnp.ndarray:
    """Space-time decay mask ``M[(ti,ni),(tj,nj)] = decay^|ti-tj|`` of shape
    ``(time_window*num_node, time_window*num_node)``.

    Matches reference Mask_Matrix (models/FC_STGNN/Model_Base.py:150-170).
    Computed host-side with numpy (static constant, baked into the jaxpr).
    """
    ti = np.arange(time_window)
    block = decay ** np.abs(ti[:, None] - ti[None, :])
    mask = np.kron(block, np.ones((num_node, num_node)))
    return jnp.asarray(mask, dtype=dtype)
