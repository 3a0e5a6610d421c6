"""Node-partitioned dense graph aggregation over a device mesh.

The reference's graphs are dense (B, N, N) — the natural TPU scaling analog
of "edge partitioning with boundary exchange" (BASELINE.json north star) is
to shard the NODE axis across the mesh's 'model' axis: each device owns a
contiguous node block, all-gathers the remote node features once per layer
(the boundary exchange, riding ICI), and computes its block of adjacency
rows + its block of the aggregation locally. Compute is O(N^2/k) per device
with one all-gather of O(N*D); XLA overlaps the collective with the local
SDDMM.

``node_sharded_dot_graph_spmm`` reproduces the exact reference math of
dot_graph_construction + SpMM (models/HierCorrPool/Model_Base.py:11-25):

    A = softmax(leaky_relu(x x^T - 1e8 I)) + I;  out = A @ v
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def node_sharded_dot_graph_spmm(x, v, mesh, axis: str = "model"):
    """x: (B, N, D) similarity features; v: (B, N, F) values -> (B, N, F).

    N must be divisible by the mesh axis size. Inputs may live anywhere;
    they are resharded so the node axis is split over ``axis``.
    """
    k = mesh.shape[axis]
    b, n, d = x.shape
    assert n % k == 0, f"N={n} not divisible by mesh axis {axis}={k}"
    blk = n // k

    def local(x_blk, v_blk):
        # x_blk: (B, N/k, D) — this device's node block.
        idx = jax.lax.axis_index(axis)
        row_offset = idx * blk

        # Boundary exchange: gather all node features (concat over axis).
        x_all = jax.lax.all_gather(x_blk, axis, axis=1, tiled=True)
        v_all = jax.lax.all_gather(v_blk, axis, axis=1, tiled=True)

        # Local SDDMM: this block's adjacency rows.
        s = jnp.einsum("bnd,bmd->bnm", x_blk, x_all)  # (B, N/k, N)
        rows = row_offset + jax.lax.broadcasted_iota(
            jnp.int32, (blk, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, n), 1)
        eye = (rows == cols).astype(s.dtype)
        s = jax.nn.leaky_relu(s - eye * 1e8, 0.01)
        a = jax.nn.softmax(s, axis=-1) + eye

        # Local SpMM over the full gathered values.
        return jnp.einsum("bnm,bmf->bnf", a, v_all)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
    v = jax.device_put(v, NamedSharding(mesh, P(None, axis, None)))
    return sharded(x, v)
