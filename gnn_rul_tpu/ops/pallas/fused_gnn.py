"""Fused dense-GNN Pallas kernel.

The hot op shared by the zoo (SURVEY §2.5): build a learned dot-product
adjacency, mask-softmax it, apply the decay mask, and aggregate —

    S = h h^T;  S = leaky_relu(S - 1e8 I);  A = softmax(S) + I;
    A = A * mask;  out = A @ x

The jnp path materializes the (B, N, N) adjacency in HBM between those
stages; this kernel keeps the whole chain in VMEM per batch element (one
grid step per sample, shapes padded to TPU tiles), cutting HBM traffic to
the h/x reads and the out write.

A numerically identical pure-jnp fallback is provided; ``fused_dot_graph_spmm``
dispatches based on platform. Correctness is tested in interpreter mode on
CPU and against the fallback on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_dot_graph_spmm_reference(h, x, mask):
    """Pure-jnp reference (identical math to ops.graphs.dot_graph_from_mapped
    followed by the decay mask and SpMM)."""
    n = h.shape[-2]
    eye = jnp.eye(n, dtype=h.dtype)
    s = jnp.einsum("...nd,...md->...nm", h, h)
    s = jax.nn.leaky_relu(s - eye * 1e8, 0.01)
    a = jax.nn.softmax(s, axis=-1) + eye
    a = a * mask
    return jnp.einsum("...nm,...md->...nd", a, x)


def _kernel(n_valid_ref, h_ref, x_ref, mask_ref, out_ref):
    n_valid = n_valid_ref[0]
    h = h_ref[0]          # (Np, Dp)
    x = x_ref[0]          # (Np, Fp)
    mask = mask_ref[:]    # (Np, Np)

    np_, _ = h.shape
    s = jax.lax.dot_general(
        h, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Np, Np)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (row_ids == col_ids).astype(s.dtype)
    col_valid = col_ids < n_valid

    s = jax.nn.leaky_relu(s - eye * 1e8, 0.01)
    # Masked softmax over valid columns only.
    s = jnp.where(col_valid, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - s_max)
    e = jnp.where(col_valid, e, 0.0)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    a = (a + eye) * mask

    out_ref[0] = jax.lax.dot_general(
        a, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dot_graph_spmm_pallas(h, x, mask, interpret: bool = False):
    """Pallas path. h: (B, N, D); x: (B, N, F); mask: (N, N) -> (B, N, F)."""
    b, n, d = h.shape
    f = x.shape[-1]
    # Lane-align Np (128): the (Np, Np) similarity/mask tiles must be
    # full-lane for Mosaic to lower at arbitrary N (this path is only
    # dispatched at N >= 384, so the padding overhead is <= 1/3 worst-case
    # and ~0 at the tile-aligned sizes the roofline sweep measured).
    np_ = _round_up(n, 128)
    dp = _round_up(d, 128)
    fp = _round_up(f, 128)

    h_p = jnp.pad(h, ((0, 0), (0, np_ - n), (0, dp - d)))
    x_p = jnp.pad(x, ((0, 0), (0, np_ - n), (0, fp - f)))
    mask_p = jnp.pad(mask, ((0, np_ - n), (0, np_ - n)))
    n_valid = jnp.asarray([n], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, fp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, np_), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, np_, fp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, fp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, h_p, x_p, mask_p)
    return out[:, :n, :f]


def _packed_kernel(n_valid_ref, h_ref, x_ref, mask_ref, out_ref):
    """Packed variant: BB samples concatenated along the node axis fill one
    MXU tile; cross-sample similarity entries are discarded by a
    block-diagonal validity mask, so one (BB*Np)^2 matmul replaces BB tiny
    ones."""
    n_valid = n_valid_ref[0]
    bb, np_, dp = h_ref.shape
    h = h_ref[:].reshape(bb * np_, dp)
    x = x_ref[:].reshape(bb * np_, -1)
    mask = mask_ref[:]  # (BB*Np, BB*Np) block-diagonal decay mask

    m = bb * np_
    s = jax.lax.dot_general(
        h, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    eye = (row_ids == col_ids).astype(s.dtype)
    same_block = (row_ids // np_) == (col_ids // np_)
    col_valid = jnp.logical_and(same_block, (col_ids % np_) < n_valid)

    s = jax.nn.leaky_relu(s - eye * 1e8, 0.01)
    s = jnp.where(col_valid, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - s_max)
    e = jnp.where(col_valid, e, 0.0)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    a = (a + eye) * mask

    out = jax.lax.dot_general(
        a, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(bb, np_, -1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_batch", "interpret"))
def fused_dot_graph_spmm_packed(h, x, mask, block_batch: int = 0,
                                interpret: bool = False):
    """Packed Pallas path for small graphs: BB samples per grid step share
    one (BB*Np)-wide matmul. ``block_batch=0`` picks BB so BB*Np ~ 256."""
    b, n, d = h.shape
    f = x.shape[-1]
    np_ = _round_up(n, 8)
    dp = _round_up(d, 128)
    fp = _round_up(f, 128)

    # Power-of-2 block batches only: non-power-of-2 packed row counts (e.g.
    # 5*32=160) hang the Mosaic compiler.
    if block_batch:
        bb = block_batch
    else:
        bb = 1
        while bb * 2 * np_ <= 256 and b % (bb * 2) == 0:
            bb *= 2

    h_p = jnp.pad(h, ((0, 0), (0, np_ - n), (0, dp - d)))
    x_p = jnp.pad(x, ((0, 0), (0, np_ - n), (0, fp - f)))
    mask_p = jnp.pad(mask, ((0, np_ - n), (0, np_ - n)))
    # Block-diagonal tiling of the per-sample mask.
    big_mask = jnp.kron(jnp.eye(bb, dtype=mask.dtype), mask_p)
    n_valid = jnp.asarray([n], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, np_, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, np_, fp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb * np_, bb * np_), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, np_, fp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _packed_kernel,
        out_shape=jax.ShapeDtypeStruct((b, np_, fp), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, h_p, x_p, big_mask)
    return out[:, :n, :f]


def fused_dot_graph_spmm(h, x, mask, use_pallas: bool = None,
                         mode: str = "auto"):
    """Dispatch by measured crossovers (BASELINE.md roofline + the r3
    end-to-end sweep, v5e):

      - n < 384:  XLA batched-matmul path. The packed kernel loses here
        end-to-end too (FC_STGNN/FD001, N=28: 228k samples/s XLA vs 198k
        packed) — XLA's fusion of many small batched matmuls beats one
        packed MXU tile once the whole train step is compiled together.
      - n >= 384: per-sample Pallas (1.5-2.1x XLA in the roofline sweep —
        the (B, N, N) adjacency spill dominates the XLA path).

    ``mode``: "auto" = the crossover table above (never Pallas off-TPU);
    "on" = always the Pallas kernel (small n: packed variant;
    interpreter-mode off-TPU, so the kernel logic is exercised in CPU
    tests); "off" = pure-jnp XLA path.
    """
    if mode == "off":
        return fused_dot_graph_spmm_reference(h, x, mask)
    n = h.shape[-2]
    if mode == "on":
        interpret = jax.default_backend() in ("cpu", "gpu")
        if n <= 64:
            return fused_dot_graph_spmm_packed(h, x, mask,
                                               interpret=interpret)
        return fused_dot_graph_spmm_pallas(h, x, mask, interpret=interpret)
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas and n >= 384:
        return fused_dot_graph_spmm_pallas(h, x, mask)
    return fused_dot_graph_spmm_reference(h, x, mask)


def _bwd_kernel(n_valid_ref, h_ref, x_ref, mask_ref, g_ref,
                dh_ref, dx_ref, dmask_ref):
    """Fused backward: recompute S/P/A in VMEM (cheaper than spilling the
    (B, N, N) residuals to HBM in the forward), then run the whole vjp
    chain without leaving VMEM:

        dx    = A^T g
        dA    = g x^T;            dmask = (P + I) dA;   dP = dA mask
        dZ    = P (dP - rowsum(dP P))        (softmax vjp per row)
        dS    = dZ * leaky'(S - 1e8 I)
        dh    = dS h + dS^T h
    """
    n_valid = n_valid_ref[0]
    h = h_ref[0]          # (Np, Dp)
    x = x_ref[0]          # (Np, Fp)
    mask = mask_ref[:]    # (Np, Np)
    g = g_ref[0]          # (Np, Fp)

    np_, _ = h.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (row_ids == col_ids).astype(jnp.float32)
    col_valid = col_ids < n_valid
    row_valid = row_ids < n_valid

    # ---- forward recompute (all VMEM)
    s = jax.lax.dot_general(
        h, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s_shift = s - eye * 1e8
    z = jnp.where(col_valid, s_shift, -jnp.inf)
    z = jnp.where(z >= 0, z, z * 0.01)  # leaky_relu keeps -inf at -inf
    z_max = jnp.max(z, axis=-1, keepdims=True)
    e = jnp.exp(z - z_max)
    e = jnp.where(col_valid, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    a = (p + eye) * mask

    # ---- backward chain
    dx = jax.lax.dot_general(  # A^T g
        a, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = jax.lax.dot_general(  # g x^T
        g, x, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dmask = (p + eye) * da
    dp = da * mask
    # softmax vjp (rows); padding columns carry p == 0 so they drop out.
    inner = jnp.sum(dp * p, axis=-1, keepdims=True)
    dz = p * (dp - inner)
    # leaky_relu' on the pre-activation (diagonal shifted to -1e8 -> 0.01
    # branch, matching the reference chain exactly).
    dslope = jnp.where(s_shift >= 0, 1.0, 0.01)
    ds = jnp.where(col_valid, dz * dslope, 0.0)
    # dh = dS h + dS^T h
    dh = jax.lax.dot_general(
        ds, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dh + jax.lax.dot_general(
        ds, h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dh_ref[0] = jnp.where(row_valid[:, :1], dh, 0.0).astype(dh_ref.dtype)
    dx_ref[0] = jnp.where(row_valid[:, :1], dx, 0.0).astype(dx_ref.dtype)
    dmask_ref[0] = jnp.where(
        jnp.logical_and(row_valid, col_valid), dmask,
        0.0).astype(dmask_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dot_graph_spmm_bwd_pallas(h, x, mask, g, interpret: bool = False):
    """Pallas fused backward. Returns (dh, dx, dmask_per_sample) where
    dmask_per_sample is (B, N, N) — sum over B outside (cheap XLA
    reduction) to get the (N, N) mask cotangent."""
    b, n, d = h.shape
    f = x.shape[-1]
    np_ = _round_up(n, 128)
    dp = _round_up(d, 128)
    fp = _round_up(f, 128)

    h_p = jnp.pad(h, ((0, 0), (0, np_ - n), (0, dp - d)))
    x_p = jnp.pad(x, ((0, 0), (0, np_ - n), (0, fp - f)))
    g_p = jnp.pad(g, ((0, 0), (0, np_ - n), (0, fp - f)))
    mask_p = jnp.pad(mask, ((0, np_ - n), (0, np_ - n)))
    n_valid = jnp.asarray([n], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, fp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, np_), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, fp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, np_, dp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, fp), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dh, dx, dmask = pl.pallas_call(
        _bwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, dp), h.dtype),
            jax.ShapeDtypeStruct((b, np_, fp), x.dtype),
            jax.ShapeDtypeStruct((b, np_, np_), mask.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(n_valid, h_p, x_p, mask_p, g_p)
    return dh[:, :n, :d], dx[:, :n, :f], dmask[:, :n, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dot_graph_spmm_trainable(h, x, mask, mode: str = "auto"):
    """Differentiable fused op: Pallas forward AND backward on TPU at
    N >= 384 (both directions keep the (N, N) chain in VMEM); jnp
    recompute backward elsewhere."""
    from ..edge_count import record_edges
    record_edges(h.shape[:-1] + (h.shape[-2],))
    return fused_dot_graph_spmm(h, x, mask, mode=mode)


def _fused_fwd(h, x, mask, mode):
    return fused_dot_graph_spmm(h, x, mask, mode=mode), (h, x, mask)


def _use_pallas_bwd(mode, n):
    # The backward kernel keeps ~6 live (Np, Np) fp32 buffers in VMEM
    # (S, P, dA, dP, dZ, dmask); at Np=1024 that is ~26 MB > the 16 MB
    # scoped-vmem limit (measured OOM on v5e), so the fused backward is
    # bounded at N <= 512 (measured: 1.77x XLA fwd+bwd at B=100 N=512
    # D=128). Larger graphs keep the Pallas forward + jnp backward.
    if n > 512:
        return False
    if mode == "on":
        return True
    return (mode == "auto" and n >= 384
            and jax.default_backend() not in ("cpu", "gpu"))


def _fused_bwd(mode, res, g):
    h, x, mask = res
    n = h.shape[-2]
    # The Pallas backward handles exactly the shared-(N, N)-mask layout the
    # one in-tree caller (FC_STGNN's decay mask) uses; a batched (B, N, N)
    # mask would need a per-sample mask feed into the kernel, so any other
    # rank takes the jnp recompute VJP instead.
    if mask.ndim == 2 and _use_pallas_bwd(mode, n):
        interpret = jax.default_backend() in ("cpu", "gpu")
        batched = h.ndim == 3
        hb = h if batched else h[None]
        xb = x if batched else x[None]
        gb = g if batched else g[None]
        dh, dx, dmask_b = fused_dot_graph_spmm_bwd_pallas(
            hb, xb, mask, gb, interpret=interpret)
        dmask = jnp.sum(dmask_b, axis=0)
        if not batched:
            dh, dx = dh[0], dx[0]
        return dh, dx, dmask.astype(mask.dtype)
    _, vjp = jax.vjp(fused_dot_graph_spmm_reference, h, x, mask)
    return vjp(g)


fused_dot_graph_spmm_trainable.defvjp(_fused_fwd, _fused_bwd)
