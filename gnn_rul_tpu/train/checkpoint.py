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
            # Multi-process + partitioned leaf. Saves are host-0-only
            # (Trainer) and may run on the AsyncCheckpointer thread, so a
            # cross-process collective here would deadlock the job. Under
            # this framework's sharding rules every partitioned axis is
            # process-local (parallel.multihost.put_global contract: TP
            # within a host, replication across hosts), so this process's
            # addressable shards cover the full global value — assemble it
            # locally.
            out = np.empty(a.shape, a.dtype)
            filled = np.zeros(a.shape, bool)
            for sh in a.addressable_shards:
                out[sh.index] = np.asarray(sh.data)
                filled[sh.index] = True
            if not filled.all():
                raise ValueError(
                    "checkpoint leaf is partitioned across processes "
                    f"(addressable shards cover {int(filled.sum())}/"
                    f"{a.size} elements); host-0-only save cannot "
                    "materialize it without a collective")
            return out
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


def restore_state(path: str, state, broadcast: bool = False):
    """Restore a TrainState-like object from a checkpoint, preserving the
    structure AND SHARDING of the given freshly-initialized state: every
    restored leaf is placed back under its template leaf's sharding, so
    on a (data, model) mesh resume feeds the global-mesh jitted steps
    exactly what init_state would have.

    ``broadcast=True`` (multi-process jobs): checkpoints are written
    host-0-only and the filesystem may not be shared, so only process 0
    reads the file; its payload is broadcast to all processes (which keeps
    params AND start-epoch agreed everywhere). The returned ``extra`` is
    then reduced to ``{"epoch": int}``.
    """
    from .engine import TrainState
    import jax.numpy as jnp

    if broadcast:
        from jax.experimental import multihost_utils

        def host_zeros(tree):
            return jax.tree_util.tree_map(
                lambda t: np.zeros(getattr(t, "shape", ()),
                                   getattr(t, "dtype", np.float32)), tree)

        if jax.process_index() == 0:
            payload = load_checkpoint(path)
            trees = (payload["params"], payload["batch_stats"],
                     payload["opt_state"],
                     np.asarray(payload["step"], np.int32),
                     np.asarray(payload["extra"].get("epoch", 0), np.int32))
        else:
            trees = (host_zeros(state.params), host_zeros(state.batch_stats),
                     host_zeros(state.opt_state),
                     np.zeros((), np.int32), np.zeros((), np.int32))
        trees = multihost_utils.broadcast_one_to_all(trees)
        params_h, bs_h, opt_h, step_h, epoch_h = trees
        extra = {"epoch": int(epoch_h)}
    else:
        payload = load_checkpoint(path)
        params_h, bs_h, opt_h = (payload["params"], payload["batch_stats"],
                                 payload["opt_state"])
        step_h, extra = payload["step"], payload["extra"]

    def _put(t, s):
        if isinstance(t, jax.Array):
            s = np.asarray(s, dtype=t.dtype)
            from jax.sharding import NamedSharding
            if isinstance(t.sharding, NamedSharding):
                from ..parallel.multihost import put_global
                return put_global(s, t.sharding.mesh, t.sharding)
            # Non-mesh template leaves (e.g. optax scalar step counts that
            # tx.init creates fresh, not derived from params) must stay
            # UNCOMMITTED: device_put would pin them to one device and make
            # them incompatible with a global-mesh jit.
            return jnp.asarray(s)
        return jnp.asarray(s, dtype=getattr(t, "dtype", None))

    def _like(template, saved):
        return jax.tree_util.tree_map(_put, template, saved)

    return TrainState(
        params=_like(state.params, params_h),
        batch_stats=_like(state.batch_stats, bs_h),
        opt_state=_like(state.opt_state, opt_h),
        step=jnp.asarray(step_h, jnp.int32),
    ), extra
