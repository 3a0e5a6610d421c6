"""Forward parity vs the mounted torch reference (aeroengine, part 1):
LSTM stacks (LOGO), GAT + TCN + GCN (STAGNN), ChebNet + GRU + top-k graphs
(STGNN), handcrafted features + GCN (SAGCN), STFT + ChebNet + autoencoder +
LSTM (STNet).

All weight mappings come from gnn_rul_tpu.compat.torch_import — these
tests double as the numerical verification of that import surface.
"""

import pytest

from parity_utils import patch_torch_cuda, run_forward_parity

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def test_logo_parity():
    run_forward_parity("LOGO", "CMAPSS", "FD001", (14, 50), batch=4,
                       seed=0, atol=2e-4, rtol=1e-4)


def test_stagnn_parity():
    run_forward_parity("STAGNN", "CMAPSS", "FD001", (14, 50), seed=1,
                       atol=5e-4, rtol=1e-4)


def test_stgnn_parity():
    run_forward_parity("STGNN", "CMAPSS", "FD001", (14, 50), seed=2,
                       atol=5e-4, rtol=1e-4)


def test_sagcn_parity():
    run_forward_parity("SAGCN", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=3, atol=5e-4, rtol=1e-3)


def test_stnet_parity():
    run_forward_parity("STNet", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=4, atol=1e-3, rtol=1e-3)
