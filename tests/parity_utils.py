"""Helpers for torch-reference parity tests.

The actual state_dict -> flax-variables mappings live in the package
(gnn_rul_tpu.compat.torch_import) so users can import reference
checkpoints; these tests consume that same single source of truth.
"""

import sys

import numpy as np

# Re-exported for tests that hand-build partial mappings.
from gnn_rul_tpu.compat.torch_import import (  # noqa: F401
    t2n, linear, conv1d, conv2d, bn_params, bn_stats, lstm_layer, gru_layer,
    bilstm_standard, tcn_params, tcn_stats, gat_layer, gat_heads,
    import_torch_state_dict)


def patch_torch_cuda():
    """Make the reference models (which hardcode .cuda()) run on CPU."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def load_reference_model(method, hp, ref_kwargs=None, seed=0):
    """Build the mounted reference's model for ``method`` with torch init
    seed ``seed``; returns the eval-mode torch module."""
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import importlib
    mod = importlib.import_module(f"models.{method}.Model")
    cls_name = "FC_STGNN_RUL" if method == "FC_STGNN" else f"{method}_model"
    cls = getattr(mod, cls_name)
    torch.manual_seed(seed)
    ref = cls(**{**hp, **(ref_kwargs or {})})
    ref.eval()
    return ref


def run_forward_parity(method, dataset, sub_id, x_shape, batch=3, seed=0,
                       atol=5e-4, rtol=1e-3, ref_kwargs=None, fused=None):
    """Full forward-parity check: same weights -> outputs allclose.

    Builds the torch reference, imports its weights via the package-level
    compat mapping, runs both forwards on the same input.
    """
    import torch
    import jax.numpy as jnp
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec

    hp = hparams.model_hparams(dataset, sub_id, method)
    ref = load_reference_model(method, hp, ref_kwargs=ref_kwargs)
    variables = import_torch_state_dict(method, ref.state_dict(), hp)

    spec = get_algorithm_spec(method)
    kwargs = dict(hp)
    if fused is not None and spec.supports_fused:
        kwargs["fused"] = fused
    ours = spec.model_cls(**kwargs)

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch,) + tuple(x_shape)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.tensor(x))
        want = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ours.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(got[0] if isinstance(got, tuple) else got)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)
    return ref, variables, x
