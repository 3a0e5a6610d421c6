"""Multi-process training worker (test/dryrun harness).

Runs one process of an N-process CPU job: joins the cluster via
``jax.distributed.initialize`` (through :func:`multihost.initialize_from_env`),
forms the global (data, model) mesh, trains the flagship model for a couple
of epochs THROUGH the ordinary Trainer — per-process sharded input upload,
GSPMD cross-host collectives, host-0-only artifacts — and writes its view of
the results to ``result_p<pid>.json`` so the launcher can assert that every
process agrees and that only host 0 produced artifacts.

Launch (one line per process)::

    XLA_FLAGS=--xla_force_host_platform_device_count=K JAX_PLATFORMS=cpu \\
    python -m gnn_rul_tpu.parallel._dist_worker \\
        --pid 0 --nproc 2 --port 12421 --outdir /tmp/out

This is the no-pod test recipe (SURVEY §4(e)); on a real pod the same code
path runs with GNNRUL_* exported by the pod launcher and no XLA_FLAGS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def synthetic_cmapss(n: int, channels: int = 14, length: int = 50,
                     seed: int = 0):
    """Deterministic synthetic (samples, labels) in the preprocessor layout
    — identical on every process and in the launcher."""
    import numpy as np
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, channels, length)).astype(np.float32)
    y = rng.uniform(size=(n, 1)).astype(np.float32)
    return x, y


def make_bundle(n_train: int = 52, n_test: int = 12):
    from gnn_rul_tpu.data.loader import DataBundle, normalize_layout
    x, y = synthetic_cmapss(n_train, seed=0)
    tx, ty = synthetic_cmapss(n_test, seed=1)
    x, y = normalize_layout(x, y)
    tx, ty = normalize_layout(tx, ty)
    return DataBundle(x, y, (tx, ty), 125.0)


def run_training(outdir: str, epochs: int = 2, n_model: int = 1,
                 resume: bool = False):
    """The common body: build mesh over ALL global devices, train, return
    (results, process_index). Callable from a single process too (mesh of
    local devices) — the multihost test compares both."""
    import jax
    from gnn_rul_tpu.parallel.mesh import make_mesh
    from gnn_rul_tpu.train.trainer import Trainer

    mesh = make_mesh(n_model=n_model)
    data = make_bundle()
    trainer = Trainer(
        method="FC_STGNN", dataset="CMAPSS", dataset_id="FD001",
        data=data, save_dir=outdir,
        experiment_description="dist", run_description="run",
        num_runs=1, mesh=mesh, checkpoint_every=1, resume=resume,
        train_params={"num_epochs": epochs, "batch_size": 16,
                      "learning_rate": 1e-3, "weight_decay": 1e-4},
    )
    results = trainer.train()
    return results, jax.process_index()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n_model", type=int, default=1)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the (host-0-only) periodic "
                         "checkpoint; exercises the cross-process "
                         "restore/start-epoch broadcast")
    args = ap.parse_args(argv)

    # CPU platform must win over any force-registered TPU plugin; the env
    # var alone is not enough when sitecustomize pre-imports jax, so flip
    # the config too (same recipe as tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    os.environ["GNNRUL_COORDINATOR"] = f"localhost:{args.port}"
    os.environ["GNNRUL_NUM_PROCESSES"] = str(args.nproc)
    os.environ["GNNRUL_PROCESS_ID"] = str(args.pid)
    from gnn_rul_tpu.parallel.multihost import initialize_from_env
    assert initialize_from_env(), "distributed init did not run"
    assert jax.process_count() == args.nproc

    # Each process writes artifacts under its OWN save_dir so the launcher
    # can verify that only host 0 actually wrote anything.
    save_dir = os.path.join(args.outdir, f"artifacts_p{args.pid}")
    results, proc = run_training(save_dir, epochs=args.epochs,
                                 n_model=args.n_model, resume=args.resume)

    payload = {
        "process_index": proc,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "best": {str(k): list(map(float, v))
                 for k, v in results[0].items()},
    }
    with open(os.path.join(args.outdir, f"result_p{args.pid}.json"),
              "w") as f:
        json.dump(payload, f)
    print(f"[p{args.pid}] done: {payload['best']}", flush=True)


if __name__ == "__main__":
    main()
