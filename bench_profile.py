"""Component-level time attribution for the highest-MFU-headroom tiers.

The r4 review's kernel policy: no more Pallas kernels without a profile
showing where XLA leaves time on the table. The axon tunnel cannot capture
xprof traces reliably, so attribution is done by TIMING EACH COMPONENT as
its own jitted scanned loop at the tier's exact shapes (forced host
round-trip, best-of-3 blocks) — the same methodology as every other bench
in this repo. Components overlap-fuse inside the real model, so the parts
need not sum to the whole; what matters is the RANKING (where would a
kernel even have room to win?).

Targets (BASELINE.md MFU table):
  - DVGTformer / NCMAPSS  (17.9% MFU, "small-matmul MXU")
  - GAT_LSTM / PHM2012    (12.2% MFU, "MXU/latency mix")

Also the graduate-or-retire A/Bs the review asked for:
  - fused_lstm (Pallas whole-recurrence) vs scan at LONG T (its claimed
    scale regime: T >> 128 where full unroll stops compiling)
  - fused_edge_mlp vs XLA at the GRU_CM tier shape in bf16 (the tier is
    HBM-bound; bf16 is where the panel traffic argument is strongest)

Usage: python bench_profile.py [--target dvgt|gat|lstm|edge|all]
Prints one JSON row per measurement.
"""

import argparse
import json
import time


def _timed(fn, *args, iters=50, repeats=3):
    """Best-of-N of a scanned loop; returns ms per iteration.

    The first argument is perturbed by ``carry * 1e-30`` each iteration so
    the body genuinely depends on the loop carry — otherwise XLA hoists
    the loop-invariant computation out of the scan and the loop times
    nothing."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            def perturb(t):
                if hasattr(t, "dtype") and jnp.issubdtype(t.dtype,
                                                          jnp.floating):
                    return t + (c * 1e-30).astype(t.dtype)
                return t
            a0 = jax.tree_util.tree_map(perturb, a[0])
            out = fn(a0, *a[1:])
            # Consume EVERY output leaf: feeding only one into the carry
            # lets XLA dead-code-eliminate the rest (measured: GAT_LSTM
            # grad-only "fwd+bwd" at 0.56 ms vs 0.79 ms forward — chunks
            # of the forward not needed by the surviving grads were DCE'd).
            tot = jnp.zeros(())
            for leaf in jax.tree_util.tree_leaves(out):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
            return c + tot, None

        tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return tot

    float(run(*args))  # compile + warmup (forced round-trip)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def profile_dvgt(batch=100):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.dvgtformer import DVGTformer, VGTBlock
    from gnn_rul_tpu.ops.graphs import pearson_graph

    hp = dict(hparams.model_hparams("NCMAPSS", None, "DVGTformer"))
    model = DVGTformer(**hp)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, hp["num_nodes"],
                                     hp["time_length"])), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)

    rows = {"tier": "DVGTformer/NCMAPSS", "batch": batch,
            "num_blocks": hp["num_blocks"]}
    rows["full_forward_ms"] = _timed(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)

    # Forward + backward (the training surface).
    def fwd_bwd(v, xx):
        # value_and_grad, both consumed: the training surface needs the
        # loss value too (the engine's scan carries it).
        return jax.value_and_grad(lambda p: jnp.sum(model.apply(
            {**v, "params": p}, xx, train=False)))(v["params"])
    rows["full_fwd_bwd_ms"] = _timed(fwd_bwd, dict(variables), x)

    # Components at the exact tier shapes.
    tokens_t = hp["time_length"] + 1   # temporal block token count
    width_t = hp["num_nodes"] + 1
    h = jnp.asarray(rng.normal(size=(batch, tokens_t, width_t)), jnp.float32)
    blk_t = VGTBlock(width_t, hp["d_model"][0], hp["num_heads"],
                     hp["lambda_param"], hp["d_ff"][0], hp["dropout"],
                     apply_dropout=True)
    vb = blk_t.init({"params": jax.random.PRNGKey(0)}, h, pearson_graph(h),
                    train=False)
    prior = pearson_graph(h)
    rows["one_tvgt_block_ms"] = _timed(
        lambda v, hh, pp: blk_t.apply(v, hh, pp, train=False), vb, h, prior)

    hs = jnp.swapaxes(h, 1, 2)
    blk_s = VGTBlock(tokens_t, hp["d_model"][1], hp["num_heads"],
                     hp["lambda_param"], hp["d_ff"][1], hp["dropout"],
                     apply_dropout=False)
    vs = blk_s.init({"params": jax.random.PRNGKey(0)}, hs,
                    pearson_graph(hs), train=False)
    prior_s = pearson_graph(hs)
    rows["one_svgt_block_ms"] = _timed(
        lambda v, hh, pp: blk_s.apply(v, hh, pp, train=False), vs, hs,
        prior_s)
    rows["pearson_priors_ms"] = _timed(
        lambda hh: (pearson_graph(hh), pearson_graph(jnp.swapaxes(hh, 1, 2))),
        h)
    return rows


def profile_gat(batch=100):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnn_rul_tpu.configs import hparams
    from gnn_rul_tpu.models.gat_lstm import GATLSTM, path_graph
    from gnn_rul_tpu.nn.attention import GraphAttentionLayer
    from gnn_rul_tpu.nn.recurrent import LSTMLayer
    from gnn_rul_tpu.signal.features import gat_lstm_features

    hp = dict(hparams.model_hparams("PHM2012", "Condition_1", "GAT_LSTM"))
    model = GATLSTM(**hp)
    rng = np.random.default_rng(0)
    L = hp["num_patch"] * hp["patch_size"]
    x = jnp.asarray(rng.normal(size=(batch, 1, L)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x,
                           train=False)
    rows = {"tier": "GAT_LSTM/PHM2012", "batch": batch,
            "num_patch": hp["num_patch"]}
    rows["full_forward_ms"] = _timed(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)

    def fwd_bwd(v, xx):
        # value_and_grad, both consumed: the training surface needs the
        # loss value too (the engine's scan carries it).
        return jax.value_and_grad(lambda p: jnp.sum(model.apply(
            {**v, "params": p}, xx, train=False)))(v["params"])
    rows["full_fwd_bwd_ms"] = _timed(fwd_bwd, dict(variables), x)

    # Components.
    flat = x.reshape(batch * hp["num_patch"], hp["patch_size"])
    rows["handcrafted_features_ms"] = _timed(
        lambda f: gat_lstm_features(f), flat)

    feats = jnp.asarray(rng.normal(size=(batch, hp["num_patch"], 11)),
                        jnp.float32)
    adj = path_graph(hp["num_patch"])
    h = feats
    stack_ms = 0.0
    for i, out_dim in enumerate(hp["hidden_dim"]):
        layer = GraphAttentionLayer(out_dim, hp.get("dropout", 0.1),
                                    negative_slope=hp.get("alpha", 0.1),
                                    final_leaky_relu=True)
        vl = layer.init({"params": jax.random.PRNGKey(i)}, h, adj,
                        train=False)
        stack_ms += _timed(
            lambda v, hh, aa: layer.apply(v, hh, aa, train=False),
            vl, h, adj)
        h = layer.apply(vl, h, adj, train=False)
    rows["gat_stack_ms"] = round(stack_ms, 4)

    lstm_ms = 0.0
    for i, hid in enumerate(hp["lstm_hidden_dim"]):
        layer = LSTMLayer(hid)
        vl = layer.init(jax.random.PRNGKey(i), h)
        lstm_ms += _timed(lambda v, hh: layer.apply(v, hh)[0], vl, h)
        h = layer.apply(vl, h)[0]
    rows["lstm_stack_ms"] = round(lstm_ms, 4)
    return rows


def ab_fused_lstm():
    """Scan vs Pallas whole-recurrence at LONG T (the kernel's claimed
    scale regime — T >> 128, where full unroll stops being compilable and
    the scan pays per-step loop overhead)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gnn_rul_tpu.ops.pallas.fused_lstm import (
        lstm_recurrence_pallas, lstm_recurrence_reference)

    rows = []
    interpret = jax.default_backend() in ("cpu", "gpu")
    for t, b, h in ((256, 100, 30), (512, 64, 30), (1024, 32, 30)):
        rng = np.random.default_rng(0)
        xg = jnp.asarray(rng.normal(size=(t, 2, b, 4 * h)) * 0.1,
                         jnp.float32)
        w = jnp.asarray(rng.normal(size=(2, h, 4 * h)) * 0.1, jnp.float32)

        def loss_scan(xg, w):
            ys, cf = lstm_recurrence_reference(xg, w)
            return jnp.sum(ys)

        def loss_pal(xg, w):
            ys, cf = lstm_recurrence_pallas(xg, w, interpret)
            return jnp.sum(ys)

        row = {"ab": "fused_lstm_long_T", "t": t, "b": b, "h": h}
        row["scan_fwd_ms"] = _timed(lstm_recurrence_reference, xg, w,
                                    iters=8)
        row["pallas_fwd_ms"] = _timed(
            lambda a, b_: lstm_recurrence_pallas(a, b_, interpret), xg, w,
            iters=8)
        row["scan_fwdbwd_ms"] = _timed(jax.grad(loss_scan, argnums=(0, 1)),
                                       xg, w, iters=8)
        row["pallas_fwdbwd_ms"] = _timed(jax.grad(loss_pal, argnums=(0, 1)),
                                         xg, w, iters=8)
        rows.append(row)
    return rows


def ab_fused_edge_mlp():
    """RETIRED (r5): the kernel won standalone fp32 (fwd 4.40 vs 5.94 ms,
    fwd+bwd 4.53 vs 5.66 at the GRU_CM tier shape M=5000 N=20 d=10) but
    LOST end-to-end at every reference shape (XLA fuses the panel into its
    producers/consumers — 95.6k vs 83.9k samples/s) and its bf16 backward
    failed to compile on this target ("Target does not support this
    comparison"). Kernel removed; measurements recorded in BASELINE.md and
    the git history of ops/pallas/fused_edge_mlp.py."""
    return [{"ab": "fused_edge_mlp", "status": "retired",
             "verdict": "standalone fp32 win, end-to-end loss + bf16 bwd "
                        "uncompilable; see BASELINE.md"}]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="all",
                    choices=["dvgt", "gat", "lstm", "edge", "all"])
    ap.add_argument("--batch", type=int, default=100)
    args = ap.parse_args()

    def emit(row):
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in row.items()}), flush=True)

    # Emit each row as soon as it is measured (a late failure must not
    # lose earlier sections); sections fail independently.
    sections = []
    if args.target in ("dvgt", "all"):
        sections.append(lambda: [profile_dvgt(args.batch)])
    if args.target in ("gat", "all"):
        sections.append(lambda: [profile_gat(args.batch)])
    if args.target in ("lstm", "all"):
        sections.append(ab_fused_lstm)
    if args.target in ("edge", "all"):
        sections.append(ab_fused_edge_mlp)
    for section in sections:
        try:
            for row in section():
                emit(row)
        except Exception as e:  # noqa: BLE001 - report, keep measuring
            emit({"error": repr(e)[:300]})


if __name__ == "__main__":
    main()
