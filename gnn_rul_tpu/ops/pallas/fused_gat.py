"""Fused dense GAT attention Pallas kernel.

The reference GAT layers (models/STAGNN/Model.py:26-60, models/STFA/
Model.py:38-45, models/GAT_LSTM, models/GDAGDL) compute

    e_ij = leaky_relu(a^T [Wh_i ; Wh_j] + b, slope)
    attn = softmax(e, axis=-1) * adj
    out  = attn @ Wh

The jnp path (nn/attention.py) already removes the (B, N^2, 2d) concat
via the rank-1 split ``e = f1 + f2^T + b`` with ``f1 = Wh a1``,
``f2 = Wh a2`` — but it still materializes the (B, N, N) logits and
attention matrices in HBM between softmax, adjacency mask, and the
aggregation matmul. This kernel keeps that whole chain in VMEM (one
sample — or a packed group of samples — per grid step), so HBM traffic
drops to the Wh/f reads and the out write, the same roofline win as
ops/pallas/fused_gnn.py.

All variants are numerically identical to :func:`fused_gat_reference`;
interpreter-mode parity is tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_gat_reference(wh, f1, f2, adj, bias, slope):
    """Pure-jnp reference. wh: (B, N, D); f1/f2: (B, N); adj: (B, N, N)
    or (N, N); bias: scalar -> (B, N, D)."""
    e = f1[..., :, None] + f2[..., None, :] + bias
    e = jax.nn.leaky_relu(e, slope)
    attn = jax.nn.softmax(e, axis=-1) * adj
    return jnp.einsum("...nm,...md->...nd", attn, wh)


def _kernel(n_valid_ref, wh_ref, f1_ref, f2_ref, adj_ref, bias_ref,
            slope_ref, out_ref):
    n_valid = n_valid_ref[0]
    wh = wh_ref[0]          # (Np, Dp)
    f1 = f1_ref[0]          # (Np, 128) — column 0 is live
    f2 = f2_ref[0]          # (8, Np)   — row 0 is live (pre-transposed on
    adj = adj_ref[0]        # (Np, Np)  #  the host: no lane->sublane move
    bias = bias_ref[0]      # in-kernel, which Mosaic lowers poorly)
    slope = slope_ref[0]

    np_, _ = wh.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    col_valid = col_ids < n_valid

    e = f1[:, :1] + f2[:1, :] + bias     # rank-1 broadcast, (Np, Np)
    e = jnp.where(e >= 0, e, e * slope)  # leaky_relu with runtime slope

    # Softmax over valid columns only (padding must not leak in).
    e = jnp.where(col_valid, e, -jnp.inf)
    e_max = jnp.max(e, axis=-1, keepdims=True)
    p = jnp.exp(e - e_max)
    p = jnp.where(col_valid, p, 0.0)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)
    attn = attn * adj

    out_ref[0] = jax.lax.dot_general(
        attn, wh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_gat_pallas(wh, f1, f2, adj, bias, slope, interpret: bool = False):
    """Pallas path. wh: (B, N, D); f1/f2: (B, N); adj: (B, N, N) or
    (N, N); bias/slope scalars -> (B, N, D)."""
    b, n, d = wh.shape
    # Np is lane-aligned (128): the (Np, Np) adj block and the (·, Np)
    # broadcast row are full-lane tiles, which Mosaic lowers for any N
    # (the old 8-row padding left e.g. N=400 lane-misaligned).
    np_ = _round_up(n, 128)
    dp = _round_up(d, 128)

    if adj.ndim == 2:
        adj = jnp.broadcast_to(adj, (b, n, n))

    wh_p = jnp.pad(wh, ((0, 0), (0, np_ - n), (0, dp - d)))
    # f1 lives in lane 0 of a (Np, 128) tile; f2 is pre-transposed into
    # sublane 0 of an (8, Np) tile (see _kernel).
    f1_p = jnp.pad(f1[..., None], ((0, 0), (0, np_ - n), (0, 127)))
    f2_p = jnp.pad(f2[:, None, :], ((0, 0), (0, 7), (0, np_ - n)))
    adj_p = jnp.pad(adj, ((0, 0), (0, np_ - n), (0, np_ - n)))
    n_valid = jnp.asarray([n], jnp.int32)
    bias_s = jnp.asarray([bias], jnp.float32)
    slope_s = jnp.asarray([slope], jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, np_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, dp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, dp), wh.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, wh_p, f1_p, f2_p, adj_p, bias_s, slope_s)
    return out[:, :n, :d]


def fused_gat(wh, f1, f2, adj, bias, slope, use_pallas: bool = None,
              mode: str = "auto"):
    """Dispatcher mirroring fused_gnn's measured crossovers: the VMEM
    fusion wins once the (N, N) attention panel no longer fits XLA's
    fusion tiles (N >= 384 on v5e); below that XLA's batched path wins.

    ``mode``: "auto" = that crossover (never Pallas off-TPU); "on" =
    always the Pallas kernel (interpreter-mode off-TPU); "off" = jnp.
    """
    if mode == "off":
        return fused_gat_reference(wh, f1, f2, adj, bias, slope)
    if mode == "on":
        interpret = jax.default_backend() in ("cpu", "gpu")
        return fused_gat_pallas(wh, f1, f2, adj, bias, slope,
                                interpret=interpret)
    if use_pallas is None:
        use_pallas = (jax.default_backend() not in ("cpu", "gpu")
                      and wh.shape[-2] >= 384)
    if use_pallas:
        return fused_gat_pallas(wh, f1, f2, adj, bias, slope)
    return fused_gat_reference(wh, f1, f2, adj, bias, slope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_gat_trainable(wh, f1, f2, adj, bias, slope, mode: str = "auto"):
    """Differentiable fused op: Pallas forward on TPU at large N,
    jnp-recompute backward (rematerializing the chain is cheaper than
    saving the (B, N, N) attention panel)."""
    return fused_gat(wh, f1, f2, adj, bias, slope, mode=mode)


def _fwd(wh, f1, f2, adj, bias, slope, mode):
    return fused_gat(wh, f1, f2, adj, bias, slope, mode=mode), (
        wh, f1, f2, adj, bias, slope)


def _bwd(mode, res, g):
    wh, f1, f2, adj, bias, slope = res
    _, vjp = jax.vjp(fused_gat_reference, wh, f1, f2, adj, bias, slope)
    return vjp(g)


fused_gat_trainable.defvjp(_fwd, _bwd)
