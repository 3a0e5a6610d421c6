"""Metric functions pinned against per-sample loop implementations of the
reference formulas (utils.py:136-201)."""

import numpy as np

from gnn_rul_tpu.train import metrics


def _ref_scoring_v1(pred, real, max_rul):
    score = 0.0
    for i in range(pred.shape[0]):
        if real[i] > pred[i]:
            score += np.exp((real[i] * max_rul - pred[i] * max_rul) / 13) - 1
        else:
            score += np.exp((pred[i] * max_rul - real[i] * max_rul) / 10) - 1
    return score, score / pred.shape[0]


def _ref_scoring_v2(pred, real):
    score = 0.0
    for i in range(pred.shape[0]):
        err = ((real[i] - pred[i]) / (real[i] + 1e-8)) * 100
        if err <= 0:
            score += np.exp(-np.log(0.5) * (err / 5))
        else:
            score += np.exp(np.log(0.5) * (err / 20))
    return score / pred.shape[0]


def test_scoring_v1():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, 50)
    real = rng.uniform(0, 1, 50)
    want_sum, want_avg = _ref_scoring_v1(pred, real, 125)
    got_sum, got_avg = metrics.scoring_function(pred, real, 125)
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-10)
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-10)


def test_scoring_v2():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.01, 1, 50)
    real = rng.uniform(0.01, 1, 50)
    np.testing.assert_allclose(metrics.scoring_function_v2(pred, real),
                               _ref_scoring_v2(pred, real), rtol=1e-10)


def test_rmse_mae():
    pred = np.array([0.5, 0.2, 0.9])
    real = np.array([0.4, 0.3, 0.7])
    np.testing.assert_allclose(
        metrics.rmse_value(pred, real, 125),
        np.sqrt(np.mean((pred - real) ** 2)) * 125)
    np.testing.assert_allclose(
        metrics.mae_value(pred, real, 125),
        np.mean(np.abs(pred - real)) * 125)


def test_calc_metrics_tuple():
    rng = np.random.default_rng(2)
    pred = rng.uniform(0.01, 1, 30)
    real = rng.uniform(0.01, 1, 30)
    s1, s2, mae, rmse = metrics.calc_metrics(pred, real, 100)
    assert s1 == metrics.scoring_function(pred, real, 100)[0]
    assert s2 == metrics.scoring_function_v2(pred, real)
    assert mae == metrics.mae_value(pred, real, 100)
    assert rmse == metrics.rmse_value(pred, real, 100)
