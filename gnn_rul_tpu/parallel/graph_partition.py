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
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def node_sharded_dot_graph_spmm(x, v, mesh, axis: str = "model",
                                mask=None):
    """x: (B, N, D) similarity features; v: (B, N, F) values -> (B, N, F).

    Optional ``mask`` (N, N): elementwise factor applied AFTER the
    softmax(+I), i.e. ``out = ((softmax(leaky(x x^T - 1e8 I)) + I) * mask)
    @ v`` — exactly the FC_STGNN decay-masked aggregation
    (models/FC_STGNN/Model_Base.py:150-170,200-209) with ``x`` the mapped
    graph features and ``v`` the raw node features.

    N must be divisible by the mesh axis size. Inputs may live anywhere;
    they are resharded so the node axis is split over ``axis``.
    """
    k = mesh.shape[axis]
    b, n, d = x.shape
    assert n % k == 0, f"N={n} not divisible by mesh axis {axis}={k}"
    blk = n // k

    def local(x_blk, v_blk, *mask_blk):
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
        if mask_blk:
            a = a * mask_blk[0]  # (N/k, N) row block of the decay mask

        # Local SpMM over the full gathered values.
        return jnp.einsum("bnm,bmf->bnf", a, v_all)

    in_specs = [P(None, axis, None), P(None, axis, None)]
    args = [x, v]
    if mask is not None:
        in_specs.append(P(axis, None))
        args.append(jnp.broadcast_to(mask, (n, n)))
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis, None),
    )
    args[0] = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis, None)))
    args[1] = jax.lax.with_sharding_constraint(
        v, NamedSharding(mesh, P(None, axis, None)))
    return sharded(*args)


def ring_dot_graph_spmm(x, v, mesh, axis: str = "model", mask=None):
    """Ring-pipelined variant of :func:`node_sharded_dot_graph_spmm` with
    online (flash-attention-style) softmax.

    Same math — ``A = softmax(leaky_relu(x x^T - 1e8 I)) + I; out = A v``
    (models/HierCorrPool/Model_Base.py:11-25) — but instead of one big
    all-gather, each device holds exactly ONE remote node block at a time
    and rotates it around the ring with ``lax.ppermute`` while computing
    on the block it already has. Peak per-device memory is O(N/k * D)
    remote state instead of O(N * D), and the statically-unrolled loop
    issues each ppermute before the matmuls that hide it, so XLA's
    latency-hiding scheduler overlaps ICI transfer with MXU compute —
    the double-buffered "boundary exchange with overlap" design from
    SURVEY.md §7.4 (item 5).

    The softmax over each adjacency row is computed online: carry a
    running row max ``m`` and normalizer ``l`` and rescale the output
    accumulator as new score blocks arrive (the standard flash/ring
    attention recurrence), so the full (N/k, N) score panel is never
    materialized either.
    """
    k = mesh.shape[axis]
    b, n, d = x.shape
    assert n % k == 0, f"N={n} not divisible by mesh axis {axis}={k}"
    blk = n // k
    neg = jnp.asarray(-1e8, x.dtype)

    def local(x_blk, v_blk, *mask_blk):
        idx = jax.lax.axis_index(axis)
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        diag = rows == cols

        perm = [(i, (i + 1) % k) for i in range(k)]

        x_rot, v_rot = x_blk, v_blk
        acc = jnp.zeros((b, blk, v_blk.shape[-1]), v_blk.dtype)
        m = jnp.full((b, blk, 1), -jnp.inf, x_blk.dtype)
        l = jnp.zeros((b, blk, 1), x_blk.dtype)

        for step in range(k):
            # Kick off the transfer of the NEXT block first; the scheduler
            # overlaps it with this step's compute (skip on the last step).
            if step + 1 < k:
                x_nxt = jax.lax.ppermute(x_rot, axis, perm)
                v_nxt = jax.lax.ppermute(v_rot, axis, perm)

            # Which owner's block we currently hold: blocks travel
            # owner -> owner+1 -> ..., so after `step` hops we hold
            # the block of (idx - step) mod k.
            src = (idx - step) % k

            s = jnp.einsum("bnd,bmd->bnm", x_blk, x_rot,
                           preferred_element_type=x_blk.dtype)
            on_diag_block = (src == idx)
            s = jnp.where(jnp.logical_and(on_diag_block, diag), s + neg, s)
            z = jax.nn.leaky_relu(s, 0.01)

            # Online softmax update. The softmax normalizer spans ALL
            # columns (the decay mask multiplies AFTER softmax, reference
            # Model_Base.py:203), so ``l`` accumulates unmasked weights
            # while ``acc`` accumulates mask-weighted values.
            m_new = jnp.maximum(m, jnp.max(z, axis=-1, keepdims=True))
            p = jnp.exp(z - m_new)
            scale = jnp.exp(m - m_new)
            if mask_blk:
                mb = jax.lax.dynamic_slice_in_dim(
                    mask_blk[0], src * blk, blk, axis=1)  # (N/k, N/k)
                pv = p * mb
            else:
                pv = p
            acc = acc * scale + jnp.einsum(
                "bnm,bmf->bnf", pv, v_rot,
                preferred_element_type=acc.dtype)
            l = l * scale + jnp.sum(p, axis=-1, keepdims=True)
            m = m_new

            if step + 1 < k:
                x_rot, v_rot = x_nxt, v_nxt

        out = acc / l
        # "+ I" term of the reference adjacency (masked when a mask is
        # given: (P + I) * mask has diagonal mask_ii on the identity).
        if mask_blk:
            diag_offset = idx * blk
            mdiag = jnp.diagonal(jax.lax.dynamic_slice_in_dim(
                mask_blk[0], diag_offset, blk, axis=1))  # (N/k,)
            return out + mdiag[None, :, None] * v_blk
        return out + v_blk

    in_specs = [P(None, axis, None), P(None, axis, None)]
    args = [jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(None, axis, None))),
            jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, P(None, axis, None)))]
    if mask is not None:
        in_specs.append(P(axis, None))
        args.append(jnp.broadcast_to(mask, (n, n)))
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis, None),
    )
    return sharded(*args)
