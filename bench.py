"""Benchmark: FC_STGNN (CMAPSS FD001 config) training throughput.

Runs the full jitted train step (forward + backward + coupled-weight-decay
Adam) at the reference batch size (100) on the default JAX device and
reports training throughput in samples/s.

Baseline: the mounted PyTorch reference (models/FC_STGNN, patched to CPU —
it hardcodes .cuda()) measured on this machine at 56.45 ms/step = 1771
samples/s (batch 100, forward+backward+Adam, torch 2.x, 2026-08-17).
``vs_baseline`` is the speedup ratio over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import subprocess
import sys
import time

TORCH_CPU_BASELINE_SAMPLES_PER_S = 1771.4
HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_HISTORY.jsonl")


def record_history(result: dict, history_path: str = HISTORY_PATH) -> None:
    """Append a dated, sha-stamped row to BENCH_HISTORY.jsonl (the
    round-over-round perf log; see `--check`)."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(history_path), capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        sha = ""
    row = dict(result)
    row["date"] = time.strftime("%Y-%m-%d %H:%M:%S")
    row["git_sha"] = sha
    import jax
    row["backend"] = jax.default_backend()
    with open(history_path, "a") as f:
        f.write(json.dumps(row) + "\n")


def check_against_history(result: dict, history_path: str = HISTORY_PATH,
                          tolerance: float = 0.05) -> bool:
    """True if the new value is within ``tolerance`` of the best recorded
    value for the same metric on the same backend (a silent >5% regression
    fails `make bench-check`)."""
    import jax
    backend = jax.default_backend()
    best = 0.0
    if os.path.exists(history_path):
        with open(history_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if (row.get("metric") == result["metric"]
                        and row.get("backend", backend) == backend):
                    best = max(best, float(row.get("value", 0.0)))
    if best <= 0.0:
        return True
    ratio = result["value"] / best
    if ratio < 1.0 - tolerance:
        print(f"REGRESSION: {result['value']:.0f} vs best recorded "
              f"{best:.0f} ({ratio:.3f}x) in {history_path}",
              file=sys.stderr)
        return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--no-history", action="store_true",
                    help="don't append this run to BENCH_HISTORY.jsonl")
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if >5%% below the best recorded value")
    ap.add_argument("--repeats", type=int, default=5,
                    help="timed blocks; best-of-N defeats capture noise "
                         "(measured r5: cross-invocation variance through "
                         "the axon tunnel is 293k-322k with tight per-run "
                         "spread, so more in-process blocks is the only "
                         "lever a single driver capture has)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.fc_stgnn import FCSTGNN
    from gnn_rul_tpu.train.engine import make_optimizer, mse

    batch = 100
    hp = hparams.model_hparams("CMAPSS", "FD001", "FC_STGNN")
    model = FCSTGNN(**hp, fused=args.fused)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 14, 50)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(batch, 1)), jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(1e-3, 1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, rng):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return mse(out, y), upd.get("batch_stats", batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    steps = 200

    @jax.jit
    def run_steps(params, batch_stats, opt_state, x, y, key):
        def body(carry, i):
            params, batch_stats, opt_state = carry
            rng = jax.random.fold_in(key, i)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y, rng)
            return (params, batch_stats, opt_state), loss

        carry, losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), jnp.arange(steps))
        return losses[-1]

    key = jax.random.PRNGKey(2)
    # Warmup/compile; float() forces a real device round-trip (a plain
    # block_until_ready does not synchronize through the axon tunnel).
    float(run_steps(params, batch_stats, opt_state, x, y, key))

    # Best-of-N timed blocks: a single timed block is hostage to transient
    # chip/tunnel contention (BENCH_r04 measured 18% low while quiet re-runs
    # gave ~310k). The best block is the machine's capability; the spread is
    # reported so a noisy capture is visible instead of silently defining
    # the round.
    block_times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        final_loss = float(run_steps(params, batch_stats, opt_state, x, y,
                                     key))
        block_times.append(time.perf_counter() - t0)
        assert final_loss == final_loss, "NaN loss"
    dt = min(block_times) / steps
    spread = (max(block_times) - min(block_times)) / min(block_times)

    samples_per_s = batch / dt
    result = {
        "metric": "fc_stgnn_fd001_train_throughput",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / TORCH_CPU_BASELINE_SAMPLES_PER_S,
                             3),
        "best_of": args.repeats,
        "spread_pct": round(100 * spread, 1),
    }
    print(json.dumps(result))
    if not args.no_history:
        try:
            record_history(result)
        except Exception as e:
            print(f"history append failed: {e!r}", file=sys.stderr)
    if args.check and not check_against_history(result):
        sys.exit(1)
    return result


if __name__ == "__main__":
    main()
