"""Engine's backend-compile-crash fallback: a crash classified as a
compiler failure triggers ONE retry under the conservative recurrence
schedule — scoped to THAT engine via a ContextVar (no process-global env
mutation), recorded in ``engine.fallback_events``."""

import os

import numpy as np
import pytest

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.nn import recurrent
from gnn_rul_tpu.train.algorithms import get_algorithm_spec
from gnn_rul_tpu.train.engine import Engine

TP = {"num_epochs": 1, "batch_size": 8, "learning_rate": 1e-3,
      "weight_decay": 1e-4}


def _engine():
    spec = get_algorithm_spec("FC_STGNN")
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    return Engine(spec.model_cls(**hp), spec, TP, seed=0)


def test_is_compile_crash_classifier():
    assert Engine._is_compile_crash(
        RuntimeError("INTERNAL: http://127.0.0.1/remote_compile: HTTP 500"))
    assert Engine._is_compile_crash(
        RuntimeError("Check failed: window.pad_low[i] == 0 (-89 vs. 0)"))
    # User-level exception types never qualify, even with a scary message.
    assert not Engine._is_compile_crash(ValueError("shape mismatch"))
    assert not Engine._is_compile_crash(ValueError("INTERNAL: nope"))
    assert not Engine._is_compile_crash(RuntimeError("CUDA out of memory"))


def test_unroll_override_scopes_to_context():
    assert recurrent._UNROLL_OVERRIDE.get() is None
    with recurrent.unroll_override(4):
        assert recurrent._auto_unroll(0, 100) == 4
        with recurrent.unroll_override(None):
            assert recurrent._UNROLL_OVERRIDE.get() is None
        assert recurrent._UNROLL_OVERRIDE.get() == 4
    assert recurrent._UNROLL_OVERRIDE.get() is None


def test_epoch_retries_once_under_conservative_schedule(monkeypatch):
    monkeypatch.delenv("GNNRUL_LSTM_UNROLL", raising=False)
    engine = _engine()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(20, 1)).astype(np.float32)
    state = engine.init_state(x)

    calls = {"n": 0}
    orig = Engine._get_epoch_fns

    def flaky(self, n):
        if self is not engine:  # engine B below uses the real factory
            return orig(self, n)
        calls["n"] += 1
        if calls["n"] == 1:
            def boom(*a, **k):
                raise RuntimeError(
                    "INTERNAL: remote_compile: tpu_compile_helper "
                    "subprocess exit code 1")
            return (boom, None), 2, 4
        # The retry happens after the per-engine fallback engaged (the
        # override context itself wraps the jitted CALLS, where tracing
        # actually happens — not this factory).
        assert self.unroll_fallback
        return orig(self, n)

    monkeypatch.setattr(Engine, "_get_epoch_fns", flaky)
    state, loss = engine.run_epoch(state, x, y, epoch=1, shuffle=True)
    assert np.isfinite(loss)
    assert calls["n"] == 2
    # The fallback engaged per-engine: recorded, NOT written to the env,
    # and not leaked into the ambient context.
    assert engine.unroll_fallback
    assert engine.fallback_events and (
        engine.fallback_events[0]["where"] == "train_epoch")
    assert os.environ.get("GNNRUL_LSTM_UNROLL") is None
    assert recurrent._UNROLL_OVERRIDE.get() is None

    # Engine B in the same process is untouched: no fallback state, and its
    # traces see no override.
    engine_b = _engine()
    assert not engine_b.unroll_fallback
    seen = {}
    orig_auto = recurrent._auto_unroll

    def spy(unroll, t, b=None):
        seen["override"] = recurrent._UNROLL_OVERRIDE.get()
        return orig_auto(unroll, t, b)

    monkeypatch.setattr(recurrent, "_auto_unroll", spy)
    state_b = engine_b.init_state(x)
    engine_b.run_epoch(state_b, x, y, epoch=1, shuffle=True)
    # FC_STGNN has no recurrence, so the spy may not fire; what must hold
    # is that B carries no fallback and the ambient override stays unset.
    assert seen.get("override") is None
    assert not engine_b.unroll_fallback

    # A second crash in engine A under the conservative schedule is NOT
    # retried again.
    calls["n"] = 0

    def always_boom(self, n):
        def boom(*a, **k):
            raise RuntimeError("INTERNAL: remote_compile crash")
        return (boom, None), 2, 4

    monkeypatch.setattr(Engine, "_get_epoch_fns", always_boom)
    with pytest.raises(RuntimeError, match="remote_compile"):
        engine.run_epoch(state, x, y, epoch=2, shuffle=True)


def test_non_compiler_errors_propagate(monkeypatch):
    monkeypatch.delenv("GNNRUL_LSTM_UNROLL", raising=False)
    engine = _engine()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(20, 1)).astype(np.float32)
    state = engine.init_state(x)

    def bad(self, n):
        def boom(*a, **k):
            raise ValueError("user bug")
        return (boom, None), 2, 4

    monkeypatch.setattr(Engine, "_get_epoch_fns", bad)
    with pytest.raises(ValueError, match="user bug"):
        engine.run_epoch(state, x, y, epoch=1, shuffle=True)
    assert not engine.unroll_fallback
    assert os.environ.get("GNNRUL_LSTM_UNROLL") is None


def test_data_cache_is_identity_checked():
    """Freeing a cached host array and allocating a new one (which may
    reuse the id) must NOT serve stale device data."""
    engine = _engine()
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(12, 14, 50)).astype(np.float32)
    y1 = rng.uniform(size=(12, 1)).astype(np.float32)
    xd1, yd1 = engine._device_data(x1, y1)
    # Same objects -> cache hit.
    xd1b, _ = engine._device_data(x1, y1)
    assert xd1b is xd1
    # The cache must retain the host arrays (ids cannot be recycled while
    # cached).
    assert engine._data_cache["x"] is x1
    # Different arrays with identical content -> fresh upload, new values.
    x2 = x1 + 1.0
    y2 = y1.copy()
    xd2, _ = engine._device_data(x2, y2)
    assert xd2 is not xd1
    np.testing.assert_allclose(np.asarray(xd2), x2)
