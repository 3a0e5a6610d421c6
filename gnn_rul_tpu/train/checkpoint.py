"""Checkpoint save/restore for train state pytrees.

Improves on the reference's write-only final checkpoint (utils.py:111-120,
trainer.py:125-126): full (params, batch_stats, opt_state, step) state with
a restore path, enabling resume — the reference has none.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(path: str, state, extra: Dict[str, Any] = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "step": int(state.step),
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_state(path: str, state):
    """Restore a TrainState-like object from a checkpoint, preserving the
    structure of the given freshly-initialized state."""
    from .engine import TrainState
    payload = load_checkpoint(path)

    def _like(template, saved):
        return jax.tree_util.tree_map(
            lambda t, s: jax.numpy.asarray(s, dtype=t.dtype), template, saved)

    import jax.numpy as jnp
    return TrainState(
        params=_like(state.params, payload["params"]),
        batch_stats=_like(state.batch_stats, payload["batch_stats"]),
        opt_state=_like(state.opt_state, payload["opt_state"]),
        step=jnp.asarray(payload["step"], jnp.int32),
    ), payload["extra"]
