"""Per-layer activation parity for FC_STGNN: intermediate activations
(encoder output, both MPNN block outputs) must allclose vs torch hooks,
not just the final output."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gnn_rul_tpu.configs import hparams
from gnn_rul_tpu.models.fc_stgnn import FCSTGNN

from parity_utils import patch_torch_cuda
from test_parity_fc_stgnn import _import_weights

sys.path.insert(0, "/root/reference")


def test_fc_stgnn_per_layer_activations():
    torch = pytest.importorskip("torch")
    patch_torch_cuda()
    from models.FC_STGNN.Model import FC_STGNN_RUL

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    torch.manual_seed(0)
    ref = FC_STGNN_RUL(**hp)
    ref.eval()

    captured = {}

    def hook(name):
        def fn(module, inp, out):
            captured[name] = out.detach().numpy()
        return fn

    ref.nonlin_map.register_forward_hook(hook("encoder"))
    ref.MPNN1.register_forward_hook(hook("mpnn1"))
    ref.MPNN2.register_forward_hook(hook("mpnn2"))

    x = np.random.default_rng(0).normal(size=(4, 14, 50)).astype(np.float32)
    with torch.no_grad():
        ref(torch.tensor(x))

    ours = FCSTGNN(**hp)
    params, batch_stats = _import_weights(ref.state_dict())
    _, state = ours.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
        train=False, capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]

    # Encoder: torch hook returns (B*T*N, C, L); ours captures the
    # FeatureExtractor1DCNNRUL __call__ output with the same layout.
    enc = np.asarray(inter["nonlin_map"]["__call__"][0])
    np.testing.assert_allclose(enc, captured["encoder"], atol=2e-5)

    # MPNN blocks: (B, nw, N, hidden) both sides.
    for name in ("mpnn1", "mpnn2"):
        got = np.asarray(inter[name]["__call__"][0])
        np.testing.assert_allclose(got, captured[name], atol=5e-5,
                                   err_msg=name)
