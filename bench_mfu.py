"""Per-tier MFU table: FLOPs/step from XLA cost analysis x measured
throughput from BENCH_HISTORY.jsonl.

FLOPs for ONE full train step (fwd + bwd + Adam at batch 100) come from
``jax.jit(train_step).lower(...).cost_analysis()`` — arithmetic counts are
backend-independent, so this runs on CPU without touching the chip, and it
deliberately does NOT cost the scanned loop (HloCostAnalysis counts a
while-loop body once, not x trip count). Throughput rows are the latest
``zoo_*`` entries in BENCH_HISTORY.jsonl recorded by bench_zoo.py on real
hardware.

    JAX_PLATFORMS=cpu python bench_mfu.py [--bf16]
"""

import argparse
import json
import os

# CPU is sufficient (arithmetic counts are backend-independent) and must
# win over the sitecustomize-forced TPU plugin.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

PEAK_FP32_TFLOPS = 49.2    # v5e MXU fp32-equivalent
PEAK_BF16_TFLOPS = 196.7   # v5e MXU bf16


def flops_per_step(method, dataset, sub_id, shape, batch=100,
                   hp_override=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.train.algorithms import (get_algorithm_spec,
                                              resolve_aux_weight)
    from gnn_rul_tpu.train.engine import make_optimizer, mse

    spec = get_algorithm_spec(method)
    hp = dict(hparams.model_hparams(dataset, sub_id, method))
    if hp_override:
        hp.update({k: v for k, v in hp_override.items() if k != "label"})
    tp = hparams.train_params(dataset, sub_id, method)
    if spec.supports_fused:
        hp["fused"] = "off"  # cost the XLA path (kernels hide flops)
    model = spec.model_cls(**hp)
    aux_w = resolve_aux_weight(spec, tp)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch,) + shape), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(batch, 1)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(tp["learning_rate"], tp.get("weight_decay", 0.0))
    opt_state = tx.init(params)

    import optax

    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            if isinstance(out, tuple):
                loss = mse(out[0], y) + aux_w * jnp.mean(out[1])
            else:
                loss = mse(out, y)
            return loss, upd.get("batch_stats", batch_stats)

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, nopt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nbs, nopt, loss

    low = jax.jit(train_step).lower(params, batch_stats, opt_state,
                                    jax.random.PRNGKey(2))
    cost = low.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float((cost or {}).get("flops", 0.0))


def latest_throughput(history_path, tag):
    best = None
    if os.path.exists(history_path):
        with open(history_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except ValueError:
                    continue
                if row.get("metric") == tag:
                    best = row  # latest wins
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    from bench_zoo import TIERS
    hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_HISTORY.jsonl")
    peak = PEAK_BF16_TFLOPS if args.bf16 else PEAK_FP32_TFLOPS
    tag_sfx = "bf16" if args.bf16 else "fp32"

    for tier in TIERS:
        method, dataset, sub_id, shape = tier[:4]
        hp_override = tier[4] if len(tier) > 4 else None
        label = (hp_override or {}).get("label", method)
        try:
            fl = flops_per_step(method, dataset, sub_id, shape,
                                hp_override=hp_override)
        except Exception as e:
            print(json.dumps({"method": label, "error": repr(e)[:120]}),
                  flush=True)
            continue
        row = {"method": label, "dataset": dataset, "sub_id": sub_id,
               "flops_per_step": fl,
               "gflops_per_sample": round(fl / 100 / 1e9, 4)}
        h = latest_throughput(hist, f"zoo_{label}_{dataset}_{sub_id}_{tag_sfx}")
        if h:
            sps = h["value"]
            tflops = fl * sps / 100 / 1e12
            row["samples_per_s"] = sps
            row["tflops"] = round(tflops, 3)
            row["mfu_pct"] = round(100.0 * tflops / peak, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
