"""Roofline micro-benchmark of the fused dense-GNN op (manual).

Sweeps (B, N, D) over scaled graph sizes, timing the jnp/XLA path and the
Pallas kernel inside a single jitted 50-iteration scan with a forced host
round-trip. Reports achieved TFLOP/s and effective HBM GB/s against the
v5e roofline (~197 TFLOP/s bf16 MXU / ~49 TFLOP/s fp32-equivalent,
~819 GB/s HBM).

FLOP model per call: SDDMM 2BN^2D + SpMM 2BN^2F (+O(BN^2) softmax, ignored).
Minimum HBM bytes: read h + x, write out (the fused kernel's adjacency never
leaves VMEM; the jnp path spills the (B, N, N) adjacency at least twice).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gnn_rul_tpu.ops.pallas.fused_gnn import (
    fused_dot_graph_spmm_pallas, fused_dot_graph_spmm_reference)

SHAPES = [
    (1024, 128, 128),
    (512, 256, 128),
    (128, 512, 128),
    (32, 1024, 128),
]


def bench(fn, h, x, mask, iters=50):
    @jax.jit
    def run(h):
        def body(c, _):
            o = fn(c, x, mask)
            return c + 0.0 * o, None

        c, _ = jax.lax.scan(body, h, None, length=iters)
        return jnp.sum(c)

    float(run(h))  # compile + warm
    t0 = time.perf_counter()
    float(run(h))  # forced round trip
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for b, n, d in SHAPES:
        h = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(n, n)), jnp.float32)

        flops = 2 * b * n * n * d * 2  # SDDMM + SpMM
        min_bytes = 4 * (2 * b * n * d + b * n * d)  # h + x in, out
        adj_bytes = 4 * b * n * n

        row = {"B": b, "N": n, "D": d,
               "flops_G": round(flops / 1e9, 2)}
        for name, fn in (("xla", fused_dot_graph_spmm_reference),
                         ("pallas", fused_dot_graph_spmm_pallas)):
            try:
                dt = bench(fn, h, x, mask)
                row[name] = {
                    "ms": round(dt * 1e3, 3),
                    "tflops": round(flops / dt / 1e12, 2),
                    "gbps_min": round(min_bytes / dt / 1e9, 1),
                    "gbps_with_adj_spill": round(
                        (min_bytes + 2 * adj_bytes) / dt / 1e9, 1),
                }
            except Exception as e:
                row[name] = {"error": repr(e)[:120]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
