"""81-epoch best-RMSE accuracy protocol on synthetic degradation data.

The container has no raw datasets, so the reference's evaluation protocol
(reference trainer.py:196-262: 81 epochs, per-epoch full-test eval, best
row by min RMSE, seed = run index) is run on SEEDED SYNTHETIC degradation
data — identical arrays fed to BOTH frameworks — for the BASELINE.md
config tiers. Accuracy parity on a learnable degradation task with the
tier's exact architecture + hyperparameters is the strongest available
proxy for the real-dataset numbers.

    python bench_accuracy.py [--tiers t1,t2,...] [--runs-ours 3]
        [--runs-torch 2] [--skip-torch]

Prints one JSON line per (tier, framework, run) with the best 4-metric
row, plus a summary row per tier.
"""

import argparse
import json
import time

import numpy as np

# (tag, method, dataset, sub_id, kind, C, L)
TIERS = [
    ("t1", "FC_STGNN", "CMAPSS", "FD001", "aero", 14, 50),
    ("t2", "STGNN", "CMAPSS", "FD004", "aero", 14, 50),
    ("t3", "HierCorrPool", "CMAPSS", "FD004", "aero", 14, 50),
    ("t4", "DVGTformer", "NCMAPSS", None, "aero", 20, 50),
    ("t5", "HierCorrPool_bearing", "PHM2012", "Condition_1",
     "bearing", 1, 2560),
]

MAX_RUL = 125.0


def synthetic_aero(channels, n_engines, seed, window=50):
    """Degradation-curve windows (same construction as
    tests/test_parity_long_training.py:26-40, scaled up): per-engine
    linear sensor drift + noise; label = capped normalized RUL."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for _ in range(n_engines):
        life = int(rng.integers(90, 140))
        ruls = np.arange(life)[::-1]
        base = rng.normal(size=(channels,))
        drift = rng.normal(size=(channels,)) * 0.01
        series = (base[None, :] + np.outer(life - 1 - ruls, drift)
                  + rng.normal(size=(life, channels)) * 0.05)
        for s in range(life - window + 1):
            xs.append(series[s:s + window].T)
            ys.append(min(ruls[s + window - 1], MAX_RUL) / MAX_RUL)
    return (np.asarray(xs, np.float32),
            np.asarray(ys, np.float32)[:, None])


def synthetic_bearing(length, n_bearings, files_per_bearing, seed):
    """Vibration snapshots whose amplitude and harmonic content grow as
    the bearing degrades; label = normalized remaining life."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    t = np.arange(length) / length
    for _ in range(n_bearings):
        freq = rng.uniform(40, 80)
        for i in range(files_per_bearing):
            frac = i / (files_per_bearing - 1)  # 0=new .. 1=dead
            amp = 0.2 + 1.8 * frac ** 2
            sig = (rng.normal(size=length) * (0.3 + 0.7 * frac)
                   + amp * np.sin(2 * np.pi * freq * t)
                   + 0.5 * frac * np.sin(2 * np.pi * 3 * freq * t))
            xs.append(sig[None, :])
            ys.append(1.0 - frac)
    return (np.asarray(xs, np.float32),
            np.asarray(ys, np.float32)[:, None])


def make_data(kind, channels, length, data_seed=1234):
    if kind == "aero":
        xtr, ytr = synthetic_aero(channels, n_engines=24, seed=data_seed)
        xte, yte = synthetic_aero(channels, n_engines=6,
                                  seed=data_seed + 1)
    else:
        xtr, ytr = synthetic_bearing(length, n_bearings=5,
                                     files_per_bearing=180, seed=data_seed)
        xte, yte = synthetic_bearing(length, n_bearings=2,
                                     files_per_bearing=120,
                                     seed=data_seed + 1)
    return xtr, ytr, xte, yte


def run_ours(method, dataset, sub_id, data, run_id, epochs=81,
             precision="fp32"):
    import jax
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.train.algorithms import get_algorithm_spec
    from gnn_rul_tpu.train.engine import Engine
    from gnn_rul_tpu.train.metrics import calc_metrics

    xtr, ytr, xte, yte = data
    spec = get_algorithm_spec(method)
    hp = dict(hparams.model_hparams(dataset, sub_id, method))
    tp = dict(hparams.train_params(dataset, sub_id, method))
    tp["num_epochs"] = epochs
    model = spec.model_cls(**hp)
    engine = Engine(model, spec, tp, seed=run_id, precision=precision)
    state = engine.init_state(xtr)

    best = None
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        state, _ = engine.run_epoch(state, xtr, ytr, epoch, shuffle=True)
        preds = engine.evaluate(state, xte)
        m = calc_metrics(preds, yte.reshape(-1), MAX_RUL)
        if best is None or m[3] < best[3]:
            best = m
    return best, time.time() - t0


def run_torch(method, dataset, sub_id, data, run_id, epochs=81):
    import sys
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from algorithms import algorithms as ref_algos
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.train.metrics import calc_metrics

    xtr, ytr, xte, yte = data
    hp = dict(hparams.model_hparams(dataset, sub_id, method))
    tp = dict(hparams.train_params(dataset, sub_id, method))
    if method == "STFA":
        hp["device"] = "cpu"
    torch.manual_seed(run_id)
    np.random.seed(run_id)
    algo = ref_algos.get_algorithm_class(method)(hp, tp, "cpu")

    bs = int(tp["batch_size"])
    n = xtr.shape[0]
    xte_t = torch.tensor(xte)
    best = None
    t0 = time.time()
    rng = np.random.default_rng(run_id + 7919)
    for epoch in range(1, epochs + 1):
        perm = rng.permutation(n)
        algo.train()
        for i in range(0, n, bs):
            idx = perm[i:i + bs]
            algo.update(torch.tensor(xtr[idx]), torch.tensor(ytr[idx]),
                        epoch)
        algo.eval()
        with torch.no_grad():
            preds = []
            for i in range(0, xte.shape[0], bs):
                out = algo.model(xte_t[i:i + bs])
                preds.append((out[0] if isinstance(out, tuple)
                              else out).numpy())
            preds = np.concatenate(preds).reshape(-1)
        m = calc_metrics(preds, yte.reshape(-1), MAX_RUL)
        if best is None or m[3] < best[3]:
            best = m
    return best, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiers", default=None,
                    help="comma-separated tags (default all)")
    ap.add_argument("--runs-ours", type=int, default=3)
    ap.add_argument("--runs-torch", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=81)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--precision", default="fp32",
                    choices=["fp32", "bf16"],
                    help="our-framework compute precision (torch side "
                         "stays fp32)")
    args = ap.parse_args()
    sel = set(args.tiers.split(",")) if args.tiers else None

    for tag, method, dataset, sub_id, kind, c, l in TIERS:
        if sel and tag not in sel:
            continue
        data = make_data(kind, c, l)
        summary = {"tier": tag, "method": method, "dataset": dataset,
                   "sub_id": sub_id, "epochs": args.epochs,
                   "n_train": int(data[0].shape[0]),
                   "n_test": int(data[2].shape[0])}
        ours = []
        for r in range(args.runs_ours):
            best, dt = run_ours(method, dataset, sub_id, data, r,
                                args.epochs, precision=args.precision)
            ours.append(best)
            print(json.dumps({"tier": tag, "fw": "ours-" + args.precision,
                              "run": r,
                              "best": [round(v, 4) for v in best],
                              "wall_s": round(dt, 1)}), flush=True)
        ref = []
        if not args.skip_torch:
            for r in range(args.runs_torch):
                best, dt = run_torch(method, dataset, sub_id, data, r,
                                     args.epochs)
                ref.append(best)
                print(json.dumps({"tier": tag, "fw": "torch", "run": r,
                                  "best": [round(v, 4) for v in best],
                                  "wall_s": round(dt, 1)}), flush=True)
        rm = [b[3] for b in ours]
        summary["ours_rmse"] = [round(v, 3) for v in rm]
        summary["ours_best"] = [round(v, 4) for v in
                                ours[int(np.argmin(rm))]]
        if ref:
            rr = [b[3] for b in ref]
            summary["torch_rmse"] = [round(v, 3) for v in rr]
            summary["torch_best"] = [round(v, 4) for v in
                                     ref[int(np.argmin(rr))]]
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
