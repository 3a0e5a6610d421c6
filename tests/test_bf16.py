"""Opt-in bf16 mixed-precision training (new capability vs the fp32-only
reference): bfloat16 compute path with fp32 master params, optimizer and
metrics. Checks the loss trajectory stays finite and close to fp32, and
that params/opt-state remain fp32."""

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
