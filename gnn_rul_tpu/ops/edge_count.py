"""Mechanical edges-per-forward accounting.

The north-star throughput metric is aggregated edges/s (SURVEY §5 row 1):
every dense adjacency or attention panel of shape ``(..., N, M)`` built
during a forward pass contributes ``prod(shape)`` processed edges. Rather
than hand-maintaining 21 per-method formulas, the graph constructors
(ops/graphs.py), the GAT attention panel (nn/attention.py), the fused
Pallas wrappers (ops/pallas/), and the few inline adjacency builds call
:func:`record_edges` at Python trace time — shapes are static, so one
abstract ``jax.eval_shape`` trace inside :func:`count_edges` yields the
exact per-batch count without running any compute.
"""

from __future__ import annotations

import contextlib
import contextvars

_COUNTER: contextvars.ContextVar = contextvars.ContextVar(
    "gnnrul_edge_counter", default=None)


def record_edges(shape) -> None:
    """Add prod(shape) edges to the active counter (no-op when inactive).

    Call with the full shape of a dense adjacency / attention panel,
    including batch-like leading axes.
    """
    acc = _COUNTER.get()
    if acc is not None:
        n = 1
        for s in shape:
            n *= int(s)
        acc[0] += n


@contextlib.contextmanager
def count_edges():
    """Context manager activating edge recording; yields a 1-element list
    whose [0] holds the running total."""
    acc = [0]
    token = _COUNTER.set(acc)
    try:
        yield acc
    finally:
        _COUNTER.reset(token)


def edges_per_sample(model, sample_x, batch: int = 2) -> int:
    """Edges processed per SAMPLE per forward pass of ``model``.

    Traces one abstract forward (train mode, no compute) at batch size
    ``batch`` and divides the recorded total. Static per (method, hparams):
    call once and reuse.
    """
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((batch,) + tuple(sample_x.shape[1:]), jnp.float32)
    rng = jax.random.PRNGKey(0)

    def init_fn():
        return model.init({"params": rng, "dropout": rng}, x, train=False)

    variables = jax.eval_shape(init_fn)  # ShapeDtypeStruct pytree

    with count_edges() as acc:
        jax.eval_shape(
            lambda v, xx: model.apply(v, xx, train=True,
                                      mutable=["batch_stats"],
                                      rngs={"dropout": rng}),
            variables, x)
    return acc[0] // batch
