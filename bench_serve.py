"""Inference / serving throughput benchmark (manual; complements bench.py's
training metric for the deployment story).

Two paths, flagship model (FC_STGNN / CMAPSS FD001):

  - ``jit``: steady-state batched inference — a 100-iteration scanned loop
    of the jitted forward with a forced host round-trip at the end
    (same axon-tunnel timing rule as every bench here). The in-process
    serving ceiling.
  - ``artifact``: the portable StableHLO serving artifact
    (gnn_rul_tpu.export) called per-batch from numpy, host->device->host
    every call — the cold-path latency a network serving frontend would
    see per request.

    python bench_serve.py [--batches 100,1000] [--steps 100]

Prints one JSON row per (path, batch).
"""

import argparse
import json
import time


def build(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.fc_stgnn import FCSTGNN

    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, 14, 50)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x[:2]), train=False)
    return model, dict(variables), x


def bench_jit(batch, steps):
    import jax
    import jax.numpy as jnp

    model, variables, x = build(batch)
    xd = jnp.asarray(x)

    @jax.jit
    def run(v, xx):
        def body(c, _):
            out = model.apply(v, xx + c * 1e-30, train=False)
            pred = out[0] if isinstance(out, tuple) else out
            return jnp.sum(pred) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    float(run(variables, xd))  # compile; float() forces the round-trip
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(variables, xd))
        best = min(best, time.perf_counter() - t0)
    return batch / (best / steps)


def bench_artifact(batch, steps):
    import numpy as np

    from gnn_rul_tpu.export import export_serving, ServingModel

    model, variables, x = build(batch)
    meta, blob = export_serving("FC_STGNN", "CMAPSS", "FD001", variables,
                                batch_size=batch)
    from jax import export as jexport
    served = ServingModel(meta, jexport.deserialize(bytearray(blob)))
    served(x)  # compile/warmup
    n = max(steps // 10, 3)   # per-call host round-trips are slow; fewer reps
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            served(x)
        best = min(best, time.perf_counter() - t0)
    return batch / (best / n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="100,1000")
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    import jax
    backend = jax.default_backend()
    for batch in (int(b) for b in args.batches.split(",")):
        for path, fn in (("jit", bench_jit), ("artifact", bench_artifact)):
            try:
                sps = fn(batch, args.steps)
                print(json.dumps({
                    "metric": f"serve_fc_stgnn_fd001_{path}",
                    "batch": batch, "value": round(sps, 1),
                    "unit": "samples/s", "backend": backend}), flush=True)
            except Exception as e:
                print(json.dumps({
                    "metric": f"serve_fc_stgnn_fd001_{path}",
                    "batch": batch, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
