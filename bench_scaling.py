"""Data-parallel scaling-efficiency harness (BASELINE.md target: >= 0.8
efficiency at N >= 2 hosts).

Weak scaling of the flagship train step: per-device batch is held at the
reference batch (100) while the mesh's ``data`` axis grows, so perfect
scaling doubles samples/s per doubling of devices. Efficiency(d) =
samples_per_s(d) / (d * samples_per_s(1)).

On this container only one real TPU chip exists, so the default run uses a
virtual 8-device CPU mesh (trend/correctness of the harness, NOT absolute
numbers). The SAME command runs unchanged on real multi-chip hardware:

    python bench_scaling.py                         # real chips, all sizes
    python bench_scaling.py --sizes 1,2,4,8 --steps 50

Multi-HOST jobs: launch one process per host with GNNRUL_COORDINATOR /
GNNRUL_NUM_PROCESSES / GNNRUL_PROCESS_ID exported (parallel.multihost) and
the same command; the mesh spans all processes' chips.

Output: one JSON line per mesh size —
    {"metric": "scaling_fc_stgnn_fd001", "mesh_data": d,
     "value": <samples/s>, "unit": "samples/s", "efficiency": e,
     "backend": "..."}
and a final summary line with the efficiency at the largest size.
"""

import argparse
import json
import os
import sys
import time


def _ensure_devices(n: int) -> None:
    """Fall back to n virtual CPU devices when the backend has fewer real
    ones (single-chip axon tunnel). Must run before first device query."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        # The container's sitecustomize force-registers the axon TPU
        # backend; the env var alone does not win — flip the config too
        # (must happen before the first device query).
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax
        jax.config.update("jax_platforms", "cpu")
        return
    import jax
    try:
        have = len(jax.devices())
    except Exception:
        have = 1
    if have < n:
        print(f"# only {have} real device(s); re-exec on a virtual "
              f"{n}-device CPU mesh (harness/trend mode)", file=sys.stderr)
        env = dict(os.environ)
        env["XLA_FLAGS"] = (flags +
                            f" --xla_force_host_platform_device_count={n}"
                            ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)


def bench_mesh(n_data: int, steps: int, per_device_batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
    from gnn_rul_tpu.parallel.mesh import make_mesh
    from gnn_rul_tpu.train.engine import make_optimizer, mse

    mesh = make_mesh(n_data=n_data, n_model=1,
                     devices=jax.devices()[:n_data])
    batch = per_device_batch * n_data

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 14, 50)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(batch, 1)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ys = jax.device_put(y, NamedSharding(mesh, P("data", None)))

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:2], train=False)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(variables["params"], repl)
    batch_stats = jax.device_put(variables.get("batch_stats", {}), repl)
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, x, y, rng):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return mse(out, y), upd.get("batch_stats", batch_stats)

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, nopt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nbs, nopt, loss

    @jax.jit
    def run(params, batch_stats, opt_state, key):
        def body(c, i):
            p, b, o = c
            p, b, o, loss = train_step(p, b, o, xs, ys,
                                       jax.random.fold_in(key, i))
            return (p, b, o), loss

        _, losses = jax.lax.scan(body, (params, batch_stats, opt_state),
                                 jnp.arange(steps))
        return losses[-1]

    key = jax.random.PRNGKey(2)
    float(run(params, batch_stats, opt_state, key))   # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, batch_stats, opt_state, key))
        best = min(best, time.perf_counter() - t0)
    dt = best / steps
    return batch / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8",
                    help="comma-separated data-axis sizes")
    ap.add_argument("--steps", type=int, default=None,
                    help="timed steps per block (default 30; 10 in "
                         "virtual-CPU trend mode)")
    ap.add_argument("--per_device_batch", type=int, default=None,
                    help="per-device batch (default 100, the reference "
                         "batch; 25 in virtual-CPU trend mode)")
    args = ap.parse_args(argv)

    sizes = [int(s) for s in args.sizes.split(",")]
    _ensure_devices(max(sizes))
    import jax
    backend = jax.default_backend()
    # Chip-sized defaults starve a 2-CPU container (the virtual mesh only
    # checks mechanics/trend, not absolute numbers) — lighten them there.
    if args.steps is None:
        args.steps = 10 if backend == "cpu" else 30
    if args.per_device_batch is None:
        args.per_device_batch = 25 if backend == "cpu" else 100

    rows = []
    base_per_device = None
    for d in sizes:
        sps = bench_mesh(d, args.steps, args.per_device_batch)
        if base_per_device is None:
            base_per_device = sps / d
        # Efficiency vs linear scaling from the smallest measured size.
        eff = sps / (d * base_per_device)
        row = {"metric": "scaling_fc_stgnn_fd001", "mesh_data": d,
               "value": round(sps, 1), "unit": "samples/s",
               "efficiency": round(eff, 3), "backend": backend}
        rows.append(row)
        print(json.dumps(row), flush=True)

    final = rows[-1]
    print(json.dumps({
        "metric": "scaling_efficiency", "value": final["efficiency"],
        "unit": f"at data={final['mesh_data']}", "target": 0.8,
        "backend": backend,
        "note": ("virtual-CPU-mesh harness check: physical cores do NOT "
                 "grow with the mesh, so ~1/d efficiency is the expected "
                 "curve here — this run only validates mechanics + schema; "
                 "the 0.8 target applies to real multi-chip, same command"
                 if backend == "cpu" else
                 "real-chip measurement")}), flush=True)
    return rows


if __name__ == "__main__":
    main()
