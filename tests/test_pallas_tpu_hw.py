"""Real-chip (non-interpret) parity for the fused Pallas kernels.

The rest of the suite runs the kernels in interpreter mode on CPU
(conftest forces JAX_PLATFORMS=cpu); this test compiles them with Mosaic
on the actual TPU in a subprocess with the container's default
environment, covering lane-misaligned N (e.g. 400) that the auto-dispatch
threshold (N >= 384) can reach. Skipped when no TPU backend is reachable.
"""

import os
import subprocess
import sys

import pytest

# Real-chip subprocess check (~3.5 min through the tunnel): slow tier.
pytestmark = pytest.mark.slow

_CHECK = r"""
import jax, jax.numpy as jnp
if jax.default_backend() in ("cpu", "gpu"):
    print("NO_TPU"); raise SystemExit(0)
from gnn_rul_tpu.ops.pallas.fused_gat import (fused_gat_pallas,
                                              fused_gat_reference)
from gnn_rul_tpu.ops.pallas.fused_gnn import (fused_dot_graph_spmm_pallas,
                                              fused_dot_graph_spmm_reference)
k = jax.random.PRNGKey(0)
for n in (400, 512):
    b, d = 2, 64
    k1, k2, k3, k4 = jax.random.split(k, 4)
    wh = jax.random.normal(k1, (b, n, d))
    f1 = jax.random.normal(k2, (b, n))
    f2 = jax.random.normal(k3, (b, n))
    adj = (jax.random.uniform(k4, (b, n, n)) > 0.5).astype(jnp.float32)
    err = jnp.max(jnp.abs(fused_gat_pallas(wh, f1, f2, adj, 0.2, 0.2)
                          - fused_gat_reference(wh, f1, f2, adj, 0.2, 0.2)))
    assert float(err) < 1e-4, ("gat", n, float(err))
    mask = (jax.random.uniform(k4, (n, n)) > 0.3).astype(jnp.float32)
    err = jnp.max(jnp.abs(fused_dot_graph_spmm_pallas(f2[..., None] * wh, wh,
                                                      mask)
                          - fused_dot_graph_spmm_reference(
                              f2[..., None] * wh, wh, mask)))
    assert float(err) < 1e-4, ("gnn", n, float(err))
print("TPU_PARITY_OK")
"""


def test_fused_kernels_compile_and_match_on_tpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo + ":/root/.axon_site"
    if "PALLAS_AXON_POOL_IPS" not in env and "GNNRUL_STASHED_POOL_IPS" in env:
        env["PALLAS_AXON_POOL_IPS"] = env["GNNRUL_STASHED_POOL_IPS"]
    try:
        proc = subprocess.run([sys.executable, "-c", _CHECK], env=env,
                              capture_output=True, text=True, timeout=540)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU backend unreachable (compile timed out)")
    out = proc.stdout + proc.stderr
    if "NO_TPU" in out or "Unable to initialize backend" in out:
        pytest.skip("no TPU backend in this environment")
    assert proc.returncode == 0 and "TPU_PARITY_OK" in proc.stdout, out[-2000:]
