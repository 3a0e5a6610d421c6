"""Dense message-passing primitives (batched SpMM-style aggregation).

All neighborhood aggregations in the benchmark are dense ``A @ X`` batched
matmuls over small graphs (N <= ~300 nodes). On TPU these land on the MXU as
a single ``dot_general``; the k-hop variants chain powers of A inside the
same traced computation so XLA can fuse.

Contracts:
  - mpnn_khop_powers: reference MPNN_mk, models/FC_STGNN/Model_Base.py:72-107
    (A^k chained as ``A_ = A_ @ A``)
  - chebyshev_recursion: reference ChebNet, models/ASTGCNN/Model.py:198-230
    (``T_0 = X, T_1 = A X, T_k = 2 A T_{k-1} - T_{k-2}``)
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def spmm(adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched dense aggregation ``A @ X``: ``(..., N, N) x (..., N, D)``."""
    return jnp.einsum("...nm,...md->...nd", adj, x)


def khop_aggregate(adj: jnp.ndarray, x: jnp.ndarray, k: int,
                   spmm_fn=None) -> List[jnp.ndarray]:
    """Return ``[A X, A^2 X, ..., A^k X]`` with ``A^j`` chained as in the
    reference (``A_ = A_ @ A`` then ``A_ @ X`` — reference
    models/FC_STGNN/Model_Base.py:89-94).

    ``spmm_fn`` overrides the aggregation product (e.g.
    parallel.graph_partition.node_sharded_spmm to split the node axis over
    a device mesh); the A-power chaining stays local.
    """
    agg = spmm_fn if spmm_fn is not None else spmm
    outs = []
    a_pow = adj
    for j in range(k):
        if j > 0:
            a_pow = jnp.einsum("...nm,...mk->...nk", a_pow, adj)
        outs.append(agg(a_pow, x))
    return outs


def chebyshev_terms(adj: jnp.ndarray, x: jnp.ndarray, k: int) -> List[jnp.ndarray]:
    """Chebyshev recursion terms ``[T_0 x, ..., T_{k-1} x]`` where
    ``T_0 = X``, ``T_1 = A X``, ``T_j = 2 A T_{j-1} - T_{j-2}``
    (reference models/ASTGCNN/Model.py:205-222)."""
    terms = [x]
    if k > 1:
        terms.append(spmm(adj, x))
    for _ in range(2, k):
        terms.append(2.0 * spmm(adj, terms[-1]) - terms[-2])
    return terms
