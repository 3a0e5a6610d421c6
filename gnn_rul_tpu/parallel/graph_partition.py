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


def spmm_hook_kwargs(method: str, mesh, axis: str = "model") -> dict:
    """Constructor kwargs routing ``method``'s graph aggregation through
    the node-sharded engine (Trainer injects these when --mesh model>1).

    Hook shapes per method family:
      - FC_STGNN: full dot-graph construction + decay mask + SpMM
        (``spmm_fn(h, nodes, mask=...)`` — :func:`node_sharded_dot_graph_spmm`)
      - LOGO / LOGO_bearing / HierCorrPool / HierCorrPool_bearing: plain
        ``A @ X`` on an explicit adjacency (``spmm_fn(adj, x)`` —
        :func:`node_sharded_spmm`; reference MPNN_mk
        models/LOGO/Model.py:130-160, Model_Base.py:66-96)
      - GAT_LSTM / STFA: the dense pairwise-attention panel
        (``gat_fn(...)`` — :func:`node_sharded_gat`; reference
        models/STFA/Model.py:11-45, models/GAT_LSTM/Model.py:74-110)
    """
    import functools
    if method == "FC_STGNN":
        return {"spmm_fn": functools.partial(
            node_sharded_dot_graph_spmm, mesh=mesh, axis=axis)}
    if method in ("LOGO", "LOGO_bearing", "HierCorrPool",
                  "HierCorrPool_bearing"):
        return {"spmm_fn": functools.partial(
            node_sharded_spmm, mesh=mesh, axis=axis)}
    if method in ("GAT_LSTM", "STFA"):
        return {"gat_fn": functools.partial(
            node_sharded_gat, mesh=mesh, axis=axis)}
    raise ValueError(f"no node-sharded hook for method {method!r}")


def node_sharded_spmm(adj, x, mesh, axis: str = "model"):
    """Plain dense aggregation ``A @ X`` with the node (row) axis sharded.

    adj (B, N, N) or (N, N); x (B, N, D) -> (B, N, D). Each device owns a
    contiguous block of adjacency ROWS and output rows; node features are
    all-gathered once (the boundary exchange, riding ICI). N is padded to
    a multiple of the axis size with zero rows/cols — exact: padded rows
    only produce padded outputs (sliced off), padded columns multiply
    zero features.

    This is the engine behind the MPNN_mk family (reference
    models/LOGO/Model.py:130-160 and 5 other copies) when the adjacency is
    already materialized (fusion gate / cluster pooling outputs).
    """
    k = mesh.shape[axis]
    b, n, d = x.shape
    if adj.ndim == 2:
        adj = jnp.broadcast_to(adj, (b, n, n))
    n_pad = -(-n // k) * k
    pad = n_pad - n
    if pad:
        adj = jnp.pad(adj, ((0, 0), (0, pad), (0, pad)))
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    def local(a_blk, x_blk):
        x_all = jax.lax.all_gather(x_blk, axis, axis=1, tiled=True)
        return jnp.einsum("bnm,bmd->bnd", a_blk, x_all)

    spec = P(None, axis, None)
    out = shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=spec)(
        jax.lax.with_sharding_constraint(adj, NamedSharding(mesh, spec)),
        jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec)))
    return out[:, :n] if pad else out


def node_sharded_gat(wh, f1, f2, adj, bias, negative_slope, mesh,
                     axis: str = "model", dropout: float = 0.0, rng=None):
    """Dense-GAT attention panel with the query (row) axis sharded.

    Reference math (models/STAGNN/Model.py:26-60 — the nn.attention
    factored form): ``e_ij = leaky_relu(f1_i + f2_j + bias)``;
    ``attn = dropout(softmax_j(e)) * adj``; ``out = attn @ Wh``.

    Each device holds a row block of queries + adjacency rows, all-gathers
    (f2, Wh) once, and computes its (N/k, N) panel locally — the full
    (N, N) attention matrix is never resident on one device. Rows are
    padded to a shard boundary; padded COLUMNS are masked to -1e30 before
    the softmax so they cannot enter real rows' normalizers.

    ``dropout``/``rng``: attention dropout sampled per row block
    (fold_in(rng, device_index)) — same Bernoulli(1-p)/(1-p) law as the
    local path, different stream (documented divergence; parity tests run
    with dropout inactive).
    """
    k = mesh.shape[axis]
    b, n, d = wh.shape
    if adj.ndim == 2:
        adj = jnp.broadcast_to(adj, (b, n, n))
    n_pad = -(-n // k) * k
    pad = n_pad - n
    if pad:
        wh = jnp.pad(wh, ((0, 0), (0, pad), (0, 0)))
        f1 = jnp.pad(f1, ((0, 0), (0, pad)))
        f2 = jnp.pad(f2, ((0, 0), (0, pad)))
        adj = jnp.pad(adj, ((0, 0), (0, pad), (0, pad)))

    def local(wh_blk, f1_blk, f2_blk, a_blk):
        wh_all = jax.lax.all_gather(wh_blk, axis, axis=1, tiled=True)
        f2_all = jax.lax.all_gather(f2_blk, axis, axis=1, tiled=True)
        e = f1_blk[:, :, None] + f2_all[:, None, :] + bias
        e = jax.nn.leaky_relu(e, negative_slope)
        if pad:
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pad), 2)
            e = jnp.where(cols >= n, jnp.asarray(-1e30, e.dtype), e)
        attn = jax.nn.softmax(e, axis=-1)
        if dropout > 0.0 and rng is not None:
            dev_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            keep = jax.random.bernoulli(dev_rng, 1.0 - dropout, attn.shape)
            attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)
        attn = attn * a_blk
        return jnp.einsum("bnm,bmd->bnd", attn, wh_all)

    row = P(None, axis, None)
    vec = P(None, axis)
    out = shard_map(
        local, mesh=mesh, in_specs=(row, vec, vec, row), out_specs=row)(
        jax.lax.with_sharding_constraint(wh, NamedSharding(mesh, row)),
        jax.lax.with_sharding_constraint(f1, NamedSharding(mesh, vec)),
        jax.lax.with_sharding_constraint(f2, NamedSharding(mesh, vec)),
        jax.lax.with_sharding_constraint(adj, NamedSharding(mesh, row)))
    return out[:, :n] if pad else out


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
