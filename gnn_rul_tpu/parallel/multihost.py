"""Multi-host (multi-process) SPMD execution.

The reference is strictly single-process — no ``torch.distributed``, NCCL,
MPI or Gloo anywhere in its tree (SURVEY §2.6; /root/reference/main.py:34
selects one ``--device``). This module is the new-capability axis: the same
Trainer/Engine runs SPMD across processes. Each process owns its local TPU
chips and feeds its slice of the input data; ``jit`` spans the global mesh
and XLA's GSPMD partitioner inserts the cross-host collectives (gradient
psums and resharding ride ICI/DCN).

Pieces:
  - :func:`initialize_from_env` — ``jax.distributed.initialize`` driven by
    ``GNNRUL_COORDINATOR`` / ``GNNRUL_NUM_PROCESSES`` / ``GNNRUL_PROCESS_ID``
    env vars (matching how pod launchers export per-worker identity).
  - :func:`shard_host_rows` — build a globally row-sharded ``jax.Array``
    via ``jax.make_array_from_process_local_data``: every process uploads
    only its own row-slice, so device memory holds 1/N of the dataset.
  - :func:`replicate_host_array` — a fully-replicated global array (small
    test sets / batch-index permutations).
  - :func:`is_main_process` — artifact writes (CSV/npz/checkpoints/log
    files) are host-0-only in the Trainer.

Testable without a pod: two CPU processes with
``XLA_FLAGS=--xla_force_host_platform_device_count=K`` form a 2K-device
global mesh with Gloo collectives (tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_from_env() -> bool:
    """Join a multi-process JAX job if the GNNRUL_* env vars describe one.

    Returns True when running multi-process after the call. Must run before
    the first JAX computation (backend init is one-way). Safe to call when
    the vars are absent (single-process: returns False, touches nothing).
    """
    coord = os.environ.get("GNNRUL_COORDINATOR")
    if not coord:
        return False
    num = int(os.environ.get("GNNRUL_NUM_PROCESSES", "1"))
    if num < 2:
        return False
    pid = int(os.environ["GNNRUL_PROCESS_ID"])
    import jax
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num, process_id=pid)
    return True


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def is_multiprocess_mesh(mesh) -> bool:
    """True when the mesh's devices span more than one process."""
    if mesh is None:
        return False
    return len({d.process_index for d in np.asarray(mesh.devices).flat}) > 1


def process_row_slice(n_rows: int, mesh) -> slice:
    """Contiguous row range of a ``data``-sharded global array owned by
    THIS process.

    ``make_mesh`` reshapes ``jax.devices()`` — which orders devices
    process-major — into a (data, model) grid, so each process owns a
    contiguous run of data-axis coordinates (its local device count divided
    by the model-axis size). ``n_rows`` must divide the data-axis size
    (see :func:`padded_rows`).
    """
    import jax
    n_data = mesh.shape["data"]
    n_model = mesh.shape.get("model", 1)
    assert n_rows % n_data == 0, (n_rows, n_data)
    local = jax.local_device_count()
    assert local % n_model == 0, (
        f"local device count {local} must divide the model axis {n_model}")
    shards_per_proc = local // n_model
    rows_per_shard = n_rows // n_data
    start = jax.process_index() * shards_per_proc * rows_per_shard
    return slice(start, start + shards_per_proc * rows_per_shard)


def padded_rows(n: int, mesh) -> int:
    """Global row count padded up to a data-axis shard boundary."""
    d = mesh.shape["data"]
    return -(-n // d) * d


def shard_host_rows(arr: np.ndarray, mesh):
    """Globally row-sharded jax.Array from a host array every process holds.

    The processed datasets are small enough that every process loads the
    same artifact into host RAM (the reference loads them whole too,
    dataloader/dataloader.py:60-94); what matters for scale is DEVICE
    memory, and here each process uploads only its own row-slice — HBM
    holds 1/N of the dataset. Rows are padded (by repeating the last row)
    to a shard boundary; callers index batches through permutations over
    the REAL length, so padding rows are never read.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = arr.shape[0]
    g = padded_rows(n, mesh)
    if g != n:
        arr = np.concatenate(
            [arr, np.repeat(arr[-1:], g - n, axis=0)], axis=0)
    if not is_multiprocess_mesh(mesh):
        import jax.numpy as jnp
        return jnp.asarray(arr)
    sl = process_row_slice(g, mesh)
    sharding = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1))))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(arr[sl]),
        global_shape=(g,) + arr.shape[1:])


def put_global(arr, mesh, sharding):
    """Place a host value on the mesh under ``sharding``.

    Single-process: plain ``jax.device_put``. Multi-process: assemble the
    global array with ``make_array_from_process_local_data`` — valid only
    for shardings whose partitioned axes stay process-local (TP within a
    host, replication across hosts), where every process's addressable
    portion is the full array; the caller guarantees all processes hold
    the same host value (deterministic same-seed init).
    """
    import jax
    if not is_multiprocess_mesh(mesh):
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_process_local_data(
        sharding, arr, global_shape=arr.shape)


def replicate_host_array(arr: np.ndarray, mesh):
    """Fully-replicated global jax.Array (every process feeds the same
    host copy)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    if not is_multiprocess_mesh(mesh):
        import jax.numpy as jnp
        return jnp.asarray(arr)
    arr = np.asarray(arr)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), arr, global_shape=arr.shape)
