"""Checkpoint save/restore for train state pytrees.

Improves on the reference's write-only final checkpoint (utils.py:111-120,
trainer.py:125-126): full (params, batch_stats, opt_state, step) state with
a restore path, enabling resume — the reference has none. Periodic saves go
through :class:`AsyncCheckpointer`: the device→host transfer, pickling and
disk write all happen on a background thread (JAX arrays are immutable, so
handing them to the writer thread is safe), with an atomic temp+rename so a
crash mid-write never corrupts the previous checkpoint.
"""

from __future__ import annotations

import os
import pickle
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    def conv(a):
        if isinstance(a, jax.Array) and not (
                a.is_fully_addressable or a.is_fully_replicated):
            # Multi-host + tensor-sharded leaf: materialize the full value
            # (host 0 is the only writer; see Trainer).
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                a, tiled=True))
        return np.asarray(a)
    return jax.tree_util.tree_map(conv, tree)


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


class AsyncCheckpointer:
    """Non-blocking periodic checkpoints (SURVEY §5 row 3: "periodic async
    checkpoints").

    ``save()`` snapshots only the pytree REFERENCES on the training thread
    (immutable jax.Arrays) and returns immediately; the D2H transfer +
    pickle + atomic write run on a single background thread. At most one
    write is in flight — a new save first waits out the previous one, so
    checkpoints land in order and memory stays bounded.
    """

    def __init__(self):
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="gnnrul-ckpt")
        self._inflight: Optional[Future] = None

    def save(self, path: str, state, extra: Dict[str, Any] = None) -> Future:
        self.wait()
        self._inflight = self._pool.submit(
            save_checkpoint, path, state, extra)
        return self._inflight

    def wait(self) -> None:
        """Block until the in-flight write (if any) is durable; re-raises
        any writer-thread exception."""
        if self._inflight is not None:
            fut, self._inflight = self._inflight, None
            fut.result()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)


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
