"""Async periodic checkpoints (SURVEY §5 row 3: "periodic async
checkpoints")."""

import os
import threading
import time

import numpy as np
import jax.numpy as jnp

from gnn_rul_tpu.train.checkpoint import (
    AsyncCheckpointer, load_checkpoint, restore_state, save_checkpoint)
from gnn_rul_tpu.train.engine import TrainState


def _state(scale=1.0, n=1000):
    return TrainState(
        params={"w": jnp.full((n, 16), scale, jnp.float32)},
        batch_stats={"bn": {"mean": jnp.zeros((16,), jnp.float32)}},
        opt_state={"mu": jnp.ones((n, 16), jnp.float32) * scale},
        step=jnp.asarray(int(scale), jnp.int32))


def test_async_save_restore_roundtrip(tmp_path):
    path = os.path.join(str(tmp_path), "checkpoint.pkl")
    ckptr = AsyncCheckpointer()
    ckptr.save(path, _state(3.0), extra={"epoch": 3})
    ckptr.wait()
    payload = load_checkpoint(path)
    assert payload["extra"]["epoch"] == 3
    restored, extra = restore_state(path, _state(0.0))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((1000, 16), 3.0, np.float32))
    assert int(restored.step) == 3
    ckptr.close()


def test_async_saves_serialize_in_order(tmp_path):
    """Back-to-back saves land in order; the last write wins."""
    path = os.path.join(str(tmp_path), "checkpoint.pkl")
    ckptr = AsyncCheckpointer()
    for epoch in (1, 2, 3):
        ckptr.save(path, _state(float(epoch)), extra={"epoch": epoch})
    ckptr.close()
    payload = load_checkpoint(path)
    assert payload["extra"]["epoch"] == 3
    np.testing.assert_array_equal(payload["params"]["w"][0, 0], 3.0)


def test_async_save_does_not_block_caller(tmp_path, monkeypatch):
    """save() must return before the write completes (the training thread
    never waits on checkpoint IO). Proven by making the writer slow and
    timing the submit call."""
    import gnn_rul_tpu.train.checkpoint as ck

    started = threading.Event()
    orig = ck.save_checkpoint

    def slow_save(path, state, extra=None):
        started.set()
        time.sleep(0.5)
        return orig(path, state, extra)

    ckptr = AsyncCheckpointer()
    monkeypatch.setattr(ck, "save_checkpoint", slow_save)
    # Re-point the pool submission at the patched function.
    path = os.path.join(str(tmp_path), "checkpoint.pkl")
    t0 = time.time()
    ckptr._pool.submit(slow_save, path, _state(1.0), {"epoch": 1})
    submit_dt = time.time() - t0
    assert submit_dt < 0.2, f"submit blocked for {submit_dt:.3f}s"
    assert started.wait(timeout=5.0)
    ckptr._pool.shutdown(wait=True)
    assert os.path.exists(path)


def test_atomic_write_never_corrupts_previous(tmp_path, monkeypatch):
    """A crash mid-write leaves the previous checkpoint intact (temp +
    os.replace)."""
    path = os.path.join(str(tmp_path), "checkpoint.pkl")
    save_checkpoint(path, _state(1.0), extra={"epoch": 1})

    import pickle

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(pickle, "dump", boom)
    try:
        save_checkpoint(path, _state(2.0), extra={"epoch": 2})
    except RuntimeError:
        pass
    monkeypatch.undo()
    payload = load_checkpoint(path)
    assert payload["extra"]["epoch"] == 1
