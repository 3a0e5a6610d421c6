"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment forces JAX_PLATFORMS=axon (remote TPU tunnel) via
sitecustomize, which runs before pytest loads this file — so overriding the
env var alone is not enough; we also flip the jax config directly. The
XLA_FLAGS must be in place before the CPU backend client is created (first
computation), which this file guarantees by setting them at import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_pool_ips = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
if _pool_ips is not None:
    # Stashed for tests that subprocess onto the real TPU
    # (tests/test_pallas_tpu_hw.py restores it in the child env).
    os.environ["GNNRUL_STASHED_POOL_IPS"] = _pool_ips
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize already imported it anyway)

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
