"""Helpers for loading torch reference weights into flax param trees."""

import numpy as np


def t2n(t):
    # COPY, not a view: .numpy() shares memory with the torch tensor, and
    # jnp.asarray on CPU can be zero-copy — an in-place torch optimizer step
    # would silently mutate the "imported" jax params.
    return np.array(t.detach().cpu().numpy())


def linear(sd, prefix):
    """torch Linear -> flax Dense: kernel is W.T."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def conv1d(sd, prefix):
    """torch Conv1d (out, in, k) -> flax Conv (k, in, out)."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def bn_params(sd, prefix):
    return {"scale": t2n(sd[f"{prefix}.weight"]),
            "bias": t2n(sd[f"{prefix}.bias"])}


def bn_stats(sd, prefix):
    return {"mean": t2n(sd[f"{prefix}.running_mean"]),
            "var": t2n(sd[f"{prefix}.running_var"])}


def lstm_layer(sd, prefix, reverse=False):
    """torch nn.LSTM single layer -> our LSTMLayer params.

    torch: weight_ih_l0 (4H, D), weight_hh_l0 (4H, H), bias_ih/hh (4H,).
    Ours: w_ih (D, 4H), w_hh (H, 4H), b_ih, b_hh. Gate order [i,f,g,o]
    matches torch.
    """
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih_l0{sfx}"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh_l0{sfx}"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih_l0{sfx}"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


def gru_layer(sd, prefix, reverse=False):
    sfx = "_reverse" if reverse else ""
    return {
        "w_ih": t2n(sd[f"{prefix}.weight_ih_l0{sfx}"]).T,
        "w_hh": t2n(sd[f"{prefix}.weight_hh_l0{sfx}"]).T,
        "b_ih": t2n(sd[f"{prefix}.bias_ih_l0{sfx}"]),
        "b_hh": t2n(sd[f"{prefix}.bias_hh_l0{sfx}"]),
    }


def patch_torch_cuda():
    """Make the reference models (which hardcode .cuda()) run on CPU."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
