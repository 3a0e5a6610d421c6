"""Device-mesh construction helpers.

The framework scales over a 2-axis mesh:
  - ``data``: batch-dimension data parallelism (the natural axis for this
    workload — batches of independent sensor graphs)
  - ``model``: tensor parallelism for wide layers (e.g. SAGCN's 1000-wide
    GCN kernels) and for sharding the dense (B, N, N) graph algebra when
    graphs grow

The reference is single-device (SURVEY §2.6); this is new capability, with
XLA inserting the psum/all-gather collectives from sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data * n_model} devices, have {len(devices)}")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rule(mesh: Mesh, min_shard_dim: int = 256):
    """Tensor-parallel rule: shard the LAST axis of any kernel whose final
    dim is divisible by the model-axis size and >= min_shard_dim; replicate
    everything else. Returns a function usable with tree_map over params."""
    n_model = mesh.shape["model"]

    def rule(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2 and n_model > 1
                and leaf.shape[-1] >= min_shard_dim
                and leaf.shape[-1] % n_model == 0):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def shard_params(params, mesh: Mesh, min_shard_dim: int = 256):
    """device_put a param pytree according to the tensor-parallel rule."""
    rule = param_sharding_rule(mesh, min_shard_dim)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, rule(leaf)), params)
