"""Forward parity vs the torch reference — bearing models.
Weight mappings come from gnn_rul_tpu.compat.torch_import."""

import pytest

from parity_utils import patch_torch_cuda, run_forward_parity

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def test_st_gcn_parity():
    run_forward_parity("ST_GCN", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=0)


def test_gat_lstm_parity():
    run_forward_parity("GAT_LSTM", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=1)


def test_gat_lstm_parity_fused():
    """Same check through the forced Pallas GAT kernel (interpret mode on
    CPU) — guards the fused path's numerics end-to-end in a real model."""
    run_forward_parity("GAT_LSTM", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=1, fused="on")


def test_gdagdl_parity():
    # STFT -> PCC -> 3 GATs accumulates fp32 reassociation error; the
    # torch/XLA gap is ~1e-3 absolute at this depth.
    run_forward_parity("GDAGDL", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=2, atol=2e-3)


def test_stmsgcn_parity():
    run_forward_parity("STMSGCN", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=3)


def test_agcn_tf_parity():
    run_forward_parity("AGCN_TF", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=4)


def test_logo_bearing_parity():
    run_forward_parity("LOGO_bearing", "PHM2012", "Condition_1", (1, 2560),
                       batch=2, seed=5)


def test_hiercorrpool_bearing_parity():
    run_forward_parity("HierCorrPool_bearing", "PHM2012", "Condition_1",
                       (1, 2560), batch=2, seed=6)
