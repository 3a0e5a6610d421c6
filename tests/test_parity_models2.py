"""Forward parity vs the torch reference — remaining aeroengine models.
Weight mappings come from gnn_rul_tpu.compat.torch_import."""

import pytest

from parity_utils import patch_torch_cuda, run_forward_parity

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def _cuda_patch():
    pytest.importorskip("torch")
    patch_torch_cuda()


def test_astgcnn_parity():
    run_forward_parity("ASTGCNN", "CMAPSS", "FD001", (14, 50), seed=0)


def test_st_conv_parity():
    run_forward_parity("ST_Conv", "CMAPSS", "FD001", (14, 50), seed=1)


def test_hiercorrpool_parity():
    run_forward_parity("HierCorrPool", "CMAPSS", "FD001", (14, 50), seed=2)


def test_hagcn_parity():
    run_forward_parity("HAGCN", "CMAPSS", "FD001", (14, 50), seed=3)


def test_rgcnu_parity():
    run_forward_parity("RGCNU", "CMAPSS", "FD001", (14, 50), batch=4, seed=4)


def test_gru_cm_parity():
    run_forward_parity("GRU_CM", "CMAPSS", "FD001", (14, 50), seed=5)


def test_stfa_parity():
    run_forward_parity("STFA", "CMAPSS", "FD001", (14, 50), seed=6,
                       ref_kwargs={"device": "cpu"})


def test_dvgtformer_parity():
    run_forward_parity("DVGTformer", "CMAPSS", "FD001", (14, 50), seed=7,
                       atol=1e-3)
