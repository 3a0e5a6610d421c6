"""Tests for cross-cutting utilities."""

import numpy as np

from gnn_rul_tpu.utils import (AverageMeter, param_count,
                               complexity_computation, prng_seq, device_sync)


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, n=10)
    m.update(4.0, n=30)
    assert m.count == 40
    np.testing.assert_allclose(m.avg, (2.0 * 10 + 4.0 * 30) / 40)


def test_param_count_and_flops():
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp)
    flops, params = complexity_computation(model, 14, 50)
    assert params > 1000
    assert flops >= 0  # backend-dependent; must not raise


def test_prng_seq_deterministic():
    import jax
    a = [jax.random.normal(k, (2,)) for _, k in zip(range(3), prng_seq(7))]
    b = [jax.random.normal(k, (2,)) for _, k in zip(range(3), prng_seq(7))]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_sync():
    import jax.numpy as jnp
    assert device_sync(jnp.asarray([3.5])) == 3.5
