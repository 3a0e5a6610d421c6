"""Opt-in bf16 mixed-precision training (new capability vs the fp32-only
reference): bfloat16 compute path with fp32 master params, optimizer and
metrics. Checks the loss trajectory stays finite and close to fp32, and
that params/opt-state remain fp32."""

import pytest

import jax.numpy as jnp
import numpy as np

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.train.algorithms import get_algorithm_spec
from gnn_rul_tpu.train.engine import Engine


def _run(precision, epochs=3, seed=0):
    spec = get_algorithm_spec("FC_STGNN")
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    tp = dict(hparams.train_params("CMAPSS", "FD001", "FC_STGNN"))
    tp["batch_size"] = 16
    model = spec.model_cls(**hp)
    engine = Engine(model, spec, tp, seed=seed, precision=precision)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(48, 14, 50)).astype(np.float32)
    y = rng.uniform(size=(48, 1)).astype(np.float32)

    state = engine.init_state(x)
    losses = []
    for epoch in range(1, epochs + 1):
        state, loss = engine.run_epoch(state, x, y, epoch, shuffle=True)
        losses.append(float(loss))
    preds = engine.evaluate(state, x)
    return state, losses, preds


def test_bf16_trains_and_matches_fp32_coarsely():
    state16, losses16, preds16 = _run("bf16")
    state32, losses32, preds32 = _run("fp32")

    assert np.all(np.isfinite(losses16))
    assert losses16[-1] < losses16[0]  # learning
    # Master params stay fp32; predictions are returned fp32.
    import jax
    for leaf in jax.tree_util.tree_leaves(state16.params):
        assert leaf.dtype == jnp.float32
    assert preds16.dtype == np.float32
    # Same trajectory at bf16 resolution (~1e-2 relative).
    np.testing.assert_allclose(losses16, losses32, rtol=0.15, atol=0.01)


@pytest.mark.parametrize("method", ["HierCorrPool_bearing", "STMSGCN",
                                    "SAGCN"])
def test_bf16_forward_through_fft_frontends(method):
    """Bearing front-ends run FFTs, which have no bf16 kernel — the signal
    layer must upcast to fp32 internally so bf16 compute works end-to-end
    (regression: rfft raised ValueError on bfloat16 input)."""
    import jax

    spec = get_algorithm_spec(method)
    hp = hparams.model_hparams("PHM2012", "Condition_1", method)
    model = spec.model_cls(**hp)
    x32 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 2560)),
                      dtype=jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x32, train=False)

    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)
    out16 = model.apply(cast(variables), cast(x32), train=False)
    pred16 = out16[0] if isinstance(out16, tuple) else out16
    assert pred16.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(pred16, dtype=np.float32)))

    out32 = model.apply(variables, x32, train=False)
    pred32 = out32[0] if isinstance(out32, tuple) else out32
    np.testing.assert_allclose(
        np.asarray(pred16, np.float32), np.asarray(pred32),
        rtol=0.1, atol=0.05)
