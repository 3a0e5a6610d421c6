"""Engine's backend-compile-crash fallback: a crash classified as a
compiler failure triggers ONE retry under the conservative recurrence
schedule (GNNRUL_LSTM_UNROLL=4) with identical math."""

import os

import numpy as np
import pytest

from gnn_rul_tpu.configs import hparams
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
    assert not Engine._is_compile_crash(ValueError("shape mismatch"))


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
        calls["n"] += 1
        if calls["n"] == 1:
            def boom(*a, **k):
                raise RuntimeError(
                    "INTERNAL: remote_compile: tpu_compile_helper "
                    "subprocess exit code 1")
            return (boom, None), 2, 4
        return orig(self, n)

    monkeypatch.setattr(Engine, "_get_epoch_fns", flaky)
    state, loss = engine.run_epoch(state, x, y, epoch=1, shuffle=True)
    assert np.isfinite(loss)
    # The fallback engaged: env pinned to the conservative schedule and the
    # epoch-fn factory was re-entered after the cache clear.
    assert os.environ.get("GNNRUL_LSTM_UNROLL") == "4"
    assert calls["n"] == 2

    # A second crash under the conservative schedule is NOT retried.
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
    assert os.environ.get("GNNRUL_LSTM_UNROLL") is None
