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


def test_save_restore_preserves_template_sharding():
    """Restored leaves carry the TEMPLATE's NamedSharding (ADVICE r4:
    restore used to rebuild with plain jnp.asarray, silently dropping
    param sharding on a TP mesh), and _to_host assembles sharded leaves
    from addressable shards — no cross-process collective."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gnn_rul_tpu.parallel.mesh import make_mesh
    import tempfile

    mesh = make_mesh(n_data=4, n_model=2)
    shard = NamedSharding(mesh, P(None, "model"))
    repl = NamedSharding(mesh, P())
    w = jax.device_put(jnp.arange(16 * 8, dtype=jnp.float32).reshape(16, 8),
                       shard)
    mu = jax.device_put(jnp.ones((16, 8), jnp.float32), shard)
    state = TrainState(
        params={"w": w},
        batch_stats={"bn": {"mean": jax.device_put(
            jnp.zeros((8,), jnp.float32), repl)}},
        opt_state={"mu": mu}, step=jnp.asarray(5, jnp.int32))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.pkl")
        save_checkpoint(path, state, extra={"epoch": 5})
        template = TrainState(
            params={"w": jax.device_put(jnp.zeros((16, 8)), shard)},
            batch_stats={"bn": {"mean": jax.device_put(
                jnp.zeros((8,)), repl)}},
            opt_state={"mu": jax.device_put(jnp.zeros((16, 8)), shard)},
            step=jnp.asarray(0, jnp.int32))
        restored, extra = restore_state(path, template)

    assert extra["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(w))
    # The template's sharding survives the round-trip.
    assert restored.params["w"].sharding == shard
    assert restored.opt_state["mu"].sharding == shard
    assert restored.batch_stats["bn"]["mean"].sharding == repl


def test_to_host_rejects_cross_process_partitioning(monkeypatch):
    """A leaf whose addressable shards do NOT cover the global value must
    raise (never silently write a partial array, never collective)."""
    from gnn_rul_tpu.train import checkpoint as ck

    class FakeShard:
        def __init__(self, index, data):
            self.index = index
            self.data = data

    class FakeLeaf:
        shape = (4, 2)
        dtype = np.float32
        size = 8
        is_fully_addressable = False
        is_fully_replicated = False
        addressable_shards = [
            FakeShard((slice(0, 2), slice(0, 2)), np.ones((2, 2)))]

    import jax
    monkeypatch.setattr(jax, "Array", (FakeLeaf,), raising=False)
    try:
        ck._to_host({"w": FakeLeaf()})
    except ValueError as e:
        assert "addressable shards cover" in str(e)
    else:
        raise AssertionError("partial coverage must raise")
