"""Multi-tier training-throughput benchmark (manual; driver uses bench.py).

For each benchmark tier, times the full jitted train step (forward +
backward + Adam) at batch 100 on the default JAX device via a scanned loop
with a forced host round-trip, and optionally the torch reference on CPU
for the same config (``--torch-baseline``).

    python bench_zoo.py [--steps 100] [--torch-baseline]
"""

import argparse
import json
import time

TIERS = [
    # (method, dataset, sub_id, input shape (C, L))
    ("FC_STGNN", "CMAPSS", "FD001", (14, 50)),
    ("HierCorrPool", "CMAPSS", "FD004", (14, 50)),
    ("STGNN", "CMAPSS", "FD004", (14, 50)),
    ("ST_GCN", "PHM2012", "Condition_1", (1, 2560)),
    ("DVGTformer", "CMAPSS", "FD001", (14, 50)),
    # BASELINE tier 4: N-CMAPSS (20 channels, dict-of-units protocol)
    ("DVGTformer", "NCMAPSS", None, (20, 50)),
    ("GRU_CM", "NCMAPSS", None, (20, 50)),
    ("GAT_LSTM", "PHM2012", "Condition_1", (1, 2560)),
    ("LOGO_bearing", "PHM2012", "Condition_1", (1, 2560)),
    ("HierCorrPool_bearing", "PHM2012", "Condition_1", (1, 2560)),
    # BASELINE tier 5 at true scale: XJTU-SY raw vibration snapshots.
    # The reference config says sequence_len=30768
    # (configs/data_model_configs.py:41) but that value is stale/unused:
    # its preprocessor writes TIMESTEP=32768 rows
    # (Data_Process/Data_read_XJTU_SY.py:20) and every XJTU model
    # reshapes to num_patch*patch_size = 32768 (hparams.py:326-434).
    ("LOGO_bearing", "XJTU_SY", "Condition_1", (1, 32768)),
    ("HierCorrPool_bearing", "XJTU_SY", "Condition_1", (1, 32768)),
    ("GAT_LSTM", "XJTU_SY", "Condition_1", (1, 32768)),
    # Scaled sensor-array config (N=256 -> 512-node window graphs): the
    # regime the per-sample fused Pallas kernel targets (N >= 384). Not a
    # reference tier — the scale row for the edges/s north star.
    ("FC_STGNN", "CMAPSS", "FD001", (256, 50),
     {"num_node": 256, "hidden_dim": 64, "label": "FC_STGNN_scaledN256"}),
]


def bench_jax(method, dataset, sub_id, shape, batch, steps, bf16=False,
              fused="auto", hp_override=None, seeds=1):
    """``seeds`` > 1 = the seed-parallel protocol (train/vectorized.py):
    vmap the whole train step over ``seeds`` independent parameter sets —
    one dispatch advances all runs, samples/s counts batch*seeds. This is
    the reference's real 5-run workload (trainer.py:79) executed as one
    program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

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
        hp["fused"] = fused
    model = spec.model_cls(**hp)
    aux_w = resolve_aux_weight(spec, tp)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch,) + shape), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(batch, 1)), jnp.float32)

    def one_init(key):
        return model.init({"params": key, "dropout": key}, x[:2],
                          train=False)

    if seeds > 1:
        keys = jnp.stack([jax.random.PRNGKey(s) for s in range(seeds)])
        variables = jax.vmap(one_init)(keys)
    else:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(tp["learning_rate"], tp.get("weight_decay", 0.0))
    opt_state = (jax.vmap(tx.init)(params) if seeds > 1
                 else tx.init(params))

    def cast(t):
        if not bf16:
            return t
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t)

    def uncast(t):
        if not bf16:
            return t
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, t)

    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": cast(p), "batch_stats": cast(batch_stats)},
                cast(x), train=True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            out = uncast(out)
            upd = uncast(dict(upd))
            if isinstance(out, tuple):
                pred, aux = out
                loss = mse(pred, y) + aux_w * jnp.mean(aux)
            else:
                loss = mse(out, y)
            return loss, upd.get("batch_stats", batch_stats)

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, nopt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), nbs, nopt, loss

    if seeds > 1:
        vstep = jax.vmap(train_step, in_axes=(0, 0, 0, 0))

        @jax.jit
        def run(params, batch_stats, opt_state, key):
            def body(c, i):
                p, b, o = c
                rngs = jax.vmap(
                    lambda s: jax.random.fold_in(jax.random.fold_in(key, s),
                                                 i))(jnp.arange(seeds))
                p, b, o, loss = vstep(p, b, o, rngs)
                return (p, b, o), loss

            _, losses = jax.lax.scan(body, (params, batch_stats, opt_state),
                                     jnp.arange(steps))
            return jnp.sum(losses[-1])
    else:
        @jax.jit
        def run(params, batch_stats, opt_state, key):
            def body(c, i):
                p, b, o = c
                p, b, o, loss = train_step(p, b, o,
                                           jax.random.fold_in(key, i))
                return (p, b, o), loss

            _, losses = jax.lax.scan(body, (params, batch_stats, opt_state),
                                     jnp.arange(steps))
            return losses[-1]

    t0 = time.time()
    float(run(params, batch_stats, opt_state, jax.random.PRNGKey(2)))
    compile_s = time.time() - t0
    best_wall = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loss = float(run(params, batch_stats, opt_state,
                         jax.random.PRNGKey(2)))
        best_wall = min(best_wall, time.perf_counter() - t0)
    dt = best_wall / steps
    batch = batch * seeds  # effective samples advanced per dispatch

    from gnn_rul_tpu.ops.edge_count import edges_per_sample
    try:
        eps = edges_per_sample(model, np.zeros((2,) + shape, np.float32))
    except Exception:
        eps = 0

    # MFU: XLA cost analysis of ONE train step (fwd + bwd + Adam) -> model
    # FLOPs per optimizer step; utilization is measured throughput over the
    # chip's peak for the compute dtype (v5e: ~197 TFLOP/s bf16 MXU,
    # ~49 TFLOP/s fp32). NOTE: costing the scanned loop would be wrong —
    # HloCostAnalysis counts a while-loop body ONCE, not x trip count — so
    # the single step is lowered separately (un-compiled cost analysis; no
    # extra device compile).
    flops_per_step = 0.0
    try:
        if seeds > 1:
            rngs0 = jnp.stack([jax.random.PRNGKey(s) for s in range(seeds)])
            single = jax.jit(vstep).lower(params, batch_stats, opt_state,
                                          rngs0)
        else:
            single = jax.jit(train_step).lower(
                params, batch_stats, opt_state, jax.random.PRNGKey(2))
        try:
            cost = single.cost_analysis()
        except Exception:
            cost = single.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_per_step = float((cost or {}).get("flops", 0.0))
    except Exception:
        pass
    tflops = flops_per_step / dt / 1e12
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    peak_tflops = (196.7 if bf16 else 49.2) if on_tpu else None
    mfu_pct = (100.0 * tflops / peak_tflops) if peak_tflops else None
    return dict(step_ms=dt * 1e3, samples_per_s=batch / dt,
                edges_per_s=batch / dt * eps, edges_per_sample=eps,
                compile_s=compile_s, loss=loss,
                flops_per_step=flops_per_step, tflops=round(tflops, 3),
                mfu_pct=round(mfu_pct, 2) if mfu_pct is not None else None)


def bench_torch(method, dataset, sub_id, shape, batch, steps=15):
    import sys
    import numpy as np
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    from algorithms import algorithms as ref_algos
    from gnn_rul_tpu.configs import hparams

    hp = hparams.model_hparams(dataset, sub_id, method)
    tp = hparams.train_params(dataset, sub_id, method)
    if method == "STFA":
        hp["device"] = "cpu"
    algo_cls = ref_algos.get_algorithm_class(method)
    algo = algo_cls(hp, tp, "cpu")
    rng = np.random.default_rng(0)
    x = torch.tensor(rng.normal(size=(batch,) + shape).astype("float32"))
    if shape[0] == 1:
        x = x.reshape(batch, -1) if method in () else x
    y = torch.tensor(rng.uniform(size=(batch, 1)).astype("float32"))
    for _ in range(2):
        algo.update(x, y, 1)
    t0 = time.perf_counter()
    for _ in range(steps):
        algo.update(x, y, 1)
    dt = (time.perf_counter() - t0) / steps
    return dict(step_ms=dt * 1e3, samples_per_s=batch / dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--torch-baseline", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute path (fp32 master params)")
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"],
                    help="Pallas fused-kernel mode for models that "
                         "support it")
    ap.add_argument("--vectorized", type=int, default=1, metavar="S",
                    help="seed-parallel protocol: vmap the train step over "
                         "S independent seeds (the reference's 5-run "
                         "workload as ONE program); samples/s counts "
                         "batch*S")
    ap.add_argument("--only", default=None)
    ap.add_argument("--no-history", action="store_true",
                    help="don't append rows to BENCH_HISTORY.jsonl")
    ap.add_argument("--dataset", default=None,
                    help="restrict tiers to one dataset")
    args = ap.parse_args()

    for tier in TIERS:
        method, dataset, sub_id, shape = tier[:4]
        hp_override = tier[4] if len(tier) > 4 else None
        label = (hp_override or {}).get("label", method)
        if args.only and label != args.only:
            continue
        if args.dataset and dataset != args.dataset:
            continue
        row = {"method": label, "dataset": dataset, "sub_id": sub_id,
               "fused": args.fused, "bf16": args.bf16,
               "seeds": args.vectorized}
        try:
            row["jax"] = bench_jax(method, dataset, sub_id, shape,
                                   args.batch, args.steps, bf16=args.bf16,
                                   fused=args.fused,
                                   hp_override=hp_override,
                                   seeds=args.vectorized)
        except Exception as e:  # keep going; report the failure
            row["jax_error"] = repr(e)[:200]
        if args.torch_baseline:
            try:
                row["torch_cpu"] = bench_torch(method, dataset, sub_id, shape,
                                               args.batch)
            except Exception as e:
                row["torch_error"] = repr(e)[:200]
        print(json.dumps(row), flush=True)
        if "jax" in row and not args.no_history:
            try:
                from bench import record_history
                tag = "bf16" if args.bf16 else "fp32"
                if args.vectorized > 1:
                    tag += f"_vec{args.vectorized}"
                record_history({
                    "metric": f"zoo_{label}_{dataset}_{sub_id}_{tag}",
                    "value": round(row["jax"]["samples_per_s"], 1),
                    "unit": "samples/s",
                    "mfu_pct": row["jax"].get("mfu_pct"),
                })
            except Exception as e:
                print(f"history append failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
