"""Dense adjacency-construction primitives (batched SDDMM-style ops).

Every GNN in the benchmark builds a dense per-sample adjacency ``(B, N, N)``
from node features ``(B, N, D)``. On TPU these are batched matmuls that map
directly onto the MXU; we keep them as single fused einsum expressions so XLA
can tile them. All functions are pure and jit/vmap/pjit-safe (static shapes,
no data-dependent control flow).

Behavioral contracts follow the reference implementations:
  - dot_graph_weights:   reference models/FC_STGNN/Model_Base.py:44-67
  - dot_graph:           reference models/HierCorrPool/Model_Base.py:11-25
  - pearson_graph:       reference models/ST_Conv/Model.py:10-28,
                         models/LOGO/Model.py:17-35
  - cosine_graph:        reference models/HAGCN/Model.py:122-127,
                         models/SAGCN/Model.py:74-79
  - gaussian_graph:      reference models/ASTGCNN/Model.py:184-195
  - gaussian_topk_graph: reference models/STGNN/Model.py:8-25
  - covariance_threshold_graph: reference models/STAGNN/Model.py:197-204
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .edge_count import record_edges


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def dot_graph_from_mapped(h: jnp.ndarray) -> jnp.ndarray:
    """Adjacency from already-projected node features.

    ``A = softmax(leaky_relu(h h^T - 1e8 I), axis=-1) + I``.

    The ``-1e8`` on the diagonal (passed through leaky_relu, so it lands at
    ``-1e6``) pushes the self-similarity to ~0 under softmax; the identity is
    then added back explicitly. Matches reference
    models/FC_STGNN/Model_Base.py:49-67 exactly.
    """
    n = h.shape[-2]
    record_edges(h.shape[:-1] + (n,))
    eye = jnp.eye(n, dtype=h.dtype)
    sim = jnp.einsum("...nd,...md->...nm", h, h)
    sim = leaky_relu(sim - eye * 1e8)
    adj = jax.nn.softmax(sim, axis=-1)
    return adj + eye


def dot_graph(x: jnp.ndarray) -> jnp.ndarray:
    """Unparameterized dot-product graph.

    ``A = softmax(leaky_relu(x x^T - 1e8 I), -1) + I`` — reference
    models/HierCorrPool/Model_Base.py:11-25 (identical math to
    :func:`dot_graph_from_mapped` but with raw features).
    """
    return dot_graph_from_mapped(x)


def pearson_graph(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Batched Pearson correlation over rows of ``x``: ``(..., N, L) -> (..., N, N)``.

    Matches ``torch.corrcoef`` per sample (reference models/LOGO/Model.py:17-35,
    models/ST_Conv/Model.py:10-28). Rows with zero variance produce 0/0 -> nan
    in torch; we guard with ``eps`` in the denominator (the reference feeds
    MinMax-scaled sensor data where variance > 0).
    """
    record_edges(x.shape[:-1] + (x.shape[-2],))
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    cov = jnp.einsum("...nl,...ml->...nm", xc, xc)
    var = jnp.sqrt(jnp.clip(jnp.einsum("...nl,...nl->...n", xc, xc), 0.0, None))
    denom = var[..., :, None] * var[..., None, :]
    return cov / (denom + eps)


def cosine_graph(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise cosine similarity of node feature rows: ``(..., N, D) -> (..., N, N)``.

    Reference models/HAGCN/Model.py:122-127 (F.cosine_similarity semantics:
    each norm is clamped below at eps).
    """
    record_edges(x.shape[:-1] + (x.shape[-2],))
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1))
    norm = jnp.maximum(norm, eps)
    sim = jnp.einsum("...nd,...md->...nm", x, x)
    return sim / (norm[..., :, None] * norm[..., None, :])


def pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances between rows: ``(..., N, D) -> (..., N, N)``."""
    record_edges(x.shape[:-1] + (x.shape[-2],))
    sq = jnp.sum(x * x, axis=-1)
    inner = jnp.einsum("...nd,...md->...nm", x, x)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * inner
    return jnp.clip(d2, 0.0, None)


def gaussian_graph(x: jnp.ndarray) -> jnp.ndarray:
    """``A = exp(-cdist(x, x))`` (euclidean, not squared) — reference
    models/ASTGCNN/Model.py:184-195.

    Computed with direct pairwise differences (matching torch.cdist
    numerics) rather than the ``a^2+b^2-2ab`` expansion, which loses fp32
    precision. Memory is O(N^2 D) per sample — fine for the benchmark's
    small graphs (N <= ~300).
    """
    record_edges(x.shape[:-1] + (x.shape[-2],))
    diff = x[..., :, None, :] - x[..., None, :, :]
    s = jnp.sum(diff * diff, axis=-1)
    # Safe sqrt: sqrt has an infinite derivative at 0 (the diagonal);
    # double-where gives the torch.cdist subgradient (0) there.
    safe = jnp.where(s > 0, s, 1.0)
    d = jnp.where(s > 0, jnp.sqrt(safe), 0.0)
    return jnp.exp(-d)


def topk_mask(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Row-wise top-k binary mask of a ``(..., N, N)`` score matrix.

    TPU-friendly: uses ``jax.lax.top_k`` threshold + compare instead of
    scatter. Ties at the threshold keep all tied entries (>= threshold),
    which can keep more than k — matching values the reference scatter would
    select for distinct scores (reference models/STGNN/Model.py:8-25).
    """
    kth = jax.lax.top_k(scores, k)[0][..., -1:]
    return (scores >= kth).astype(scores.dtype)


def gaussian_topk_graph(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Gaussian-kernel similarity sparsified to row-wise top-k
    (reference models/STGNN/Model.py:8-25)."""
    a = gaussian_graph(x)
    return a * topk_mask(a, k)


def covariance_threshold_graph(x: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Thresholded covariance adjacency over rows of ``(..., N, L)``
    (reference models/STAGNN/Model.py:197-204): ``A = (cov > threshold)``
    as float, where cov uses the unbiased row-covariance (torch.cov)."""
    record_edges(x.shape[:-1] + (x.shape[-2],))
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    cov = jnp.einsum("...nl,...ml->...nm", xc, xc) / (n - 1)
    return (cov > threshold).astype(x.dtype)


def add_self_loops(adj: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    n = adj.shape[-1]
    return adj + weight * jnp.eye(n, dtype=adj.dtype)


def sym_normalize(adj: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Symmetric normalization ``D^-1/2 (A) D^-1/2`` of a dense adjacency.

    Reference GCNLayer, models/RGCNU/Model.py:7-21 (degree from row sums).
    """
    deg = jnp.sum(adj, axis=-1)
    d_inv_sqrt = jax.lax.rsqrt(jnp.clip(deg, eps, None) + 1e-12)
    return adj * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]
