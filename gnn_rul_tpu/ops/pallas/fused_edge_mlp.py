"""Pallas TPU kernel: fused edge-MLP + sum aggregation for GRU_CM.

The reference's GNNLayer (models/GRU_CM/Model.py:6-40) builds
``relu(Linear(cat[x_i, x_j]))`` over ALL N^2 node pairs and sums over j.
Even with the concat split into two matmuls, the XLA path materializes the
(B, L, N, N, d) edge tensor through HBM in both the forward and the saved
residuals of the backward — ~80 MB per pass at the N-CMAPSS config, which
is the measured bottleneck of the GRU_CM tier (1.2% MFU, bf16 1.56x =
HBM-bound signature).

This kernel computes ``out[m, i, :] = sum_j relu(p1[m, i, :] + p2q[m, j, :])``
(with the edge bias pre-folded into ``p2q``) entirely in VMEM: the N^2
panel never exists in HBM. Layout puts the flattened batch (M = B*L) in
LANES and (N, d) in the leading/sublane axes, so the j-loop is N pure VPU
passes over (N, dp, Mtile) tiles. The backward recomputes the relu masks
from the same inputs (two VPU passes) instead of saving the panel.

Reference hot op: models/GRU_CM/Model.py:20-29.

MEASURED VERDICT (v5e, the N-CMAPSS GRU_CM shape M=5000 N=20 d=10): in
ISOLATION the kernel beats the XLA panel 1.35 ms vs 1.94 ms fwd+bwd
(1.44x) — but END-TO-END the GRU_CM tier runs 83.9k samples/s fused vs
95.6k plain (0.88x): inside the model XLA fuses the producer einsums into
the panel consumer, while the pallas_call boundary forces the
(M,N,d)->(N,dp,M) layout transposes through HBM and bars that fusion. The
model dispatch is therefore ``auto`` = XLA, ``on`` = kernel.

Known limitation: at larger shapes (measured: N=64 d=32 M=5000) this
container's XLA toolchain assigns the backward pallas_call's FULL-SIZE
results to VMEM space (S(1)) regardless of the blocked out_specs and
fails buffer assignment ("Scoped allocation ... exceeded scoped vmem
limit"); the opt-in is validated at the reference-size shapes (parity
tests + the 1.44x isolation win above).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(p1_ref, p2_ref, out_ref, *, n):
    p1 = p1_ref[...]
    acc = jnp.zeros(p1.shape, p1.dtype)
    for j in range(n):
        acc = acc + jnp.maximum(p1 + p2_ref[j][None], 0.0)
    out_ref[...] = acc


def _bwd_kernel(p1_ref, p2_ref, g_ref, dp1_ref, dp2_ref, *, n):
    p1 = p1_ref[...]
    dp1 = jnp.zeros(p1.shape, p1.dtype)
    g = g_ref[...]
    for j in range(n):
        mask = (p1 + p2_ref[j][None] > 0.0).astype(g.dtype)
        mg = mask * g
        dp1 = dp1 + mg
        dp2_ref[j] = jnp.sum(mg, axis=0)
    dp1_ref[...] = dp1


def _to_kernel_layout(p, n, dp, m_pad):
    """(M, N, d) -> (N, dp, M_pad): batch in lanes, d in sublanes."""
    mm, _, d = p.shape
    p = jnp.transpose(p, (1, 2, 0))                   # (N, d, M)
    return jnp.pad(p, ((0, 0), (0, dp - d), (0, m_pad - mm)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def edge_mlp_sum(p1, p2q, interpret: bool = False):
    """p1, p2q: (M, N, d) projected node features (bias folded into p2q)
    -> (M, N, d): ``out[m, i] = sum_j relu(p1[m, i] + p2q[m, j])``."""
    out, _ = _fwd(p1, p2q, interpret)
    return out


def _run(kernel, n, dp, m_pad, m_tile, n_out, interpret, *args):
    grid = (m_pad // m_tile,)
    spec = pl.BlockSpec((n, dp, m_tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((n, dp, m_pad), args[0].dtype)
                   for _ in range(n_out)],
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * n_out,
        interpret=interpret,
    )(*args)


def _plan(p1, n_buffers: int):
    m, n, d = p1.shape
    dp = _pad_to(d, 8)
    # Lane tile: bigger blocks amortize grid overhead; bounded by VMEM.
    # Pallas DOUBLE-BUFFERS every streamed in/out block across grid steps,
    # so the budget per (N, dp, Mtile) fp32 block counts twice — size
    # against a conservative 5 MB so n_buffers * 2 * block stays under the
    # 16 MB scoped limit with working set to spare.
    m_tile = 512
    budget = 5 * 1024 * 1024
    while m_tile > 128 and n_buffers * n * dp * m_tile * 4 > budget:
        m_tile //= 2
    return m, n, d, dp, _pad_to(m, m_tile), m_tile


def _fwd(p1, p2q, interpret):
    # fwd live blocks: p1, p2, out (+1 accumulator working set)
    m, n, d, dp, m_pad, m_tile = _plan(p1, 4)
    p1k = _to_kernel_layout(p1, n, dp, m_pad)
    p2k = _to_kernel_layout(p2q, n, dp, m_pad)
    (outk,) = _run(functools.partial(_fwd_kernel, n=n),
                   n, dp, m_pad, m_tile, 1, interpret, p1k, p2k)
    out = jnp.transpose(outk[:, :d, :m], (2, 0, 1))   # (M, N, d)
    return out, (p1, p2q)


def _bwd(interpret, res, g):
    p1, p2q = res
    # bwd live blocks: p1, p2, g, dp1, dp2 (+2 working set)
    m, n, d, dp, m_pad, m_tile = _plan(p1, 7)
    p1k = _to_kernel_layout(p1, n, dp, m_pad)
    p2k = _to_kernel_layout(p2q, n, dp, m_pad)
    gk = _to_kernel_layout(g, n, dp, m_pad)
    dp1k, dp2k = _run(functools.partial(_bwd_kernel, n=n),
                      n, dp, m_pad, m_tile, 2, interpret, p1k, p2k, gk)
    dp1 = jnp.transpose(dp1k[:, :d, :m], (2, 0, 1))
    dp2 = jnp.transpose(dp2k[:, :d, :m], (2, 0, 1))
    return dp1, dp2


edge_mlp_sum.defvjp(lambda p1, p2q, interpret: _fwd(p1, p2q, interpret),
                    _bwd)


def edge_mlp_sum_reference(p1, p2q):
    """Plain-XLA semantics twin (materializes the (M, N, N, d) panel)."""
    edge = jax.nn.relu(p1[:, :, None, :] + p2q[:, None, :, :])
    return jnp.sum(edge, axis=2)
