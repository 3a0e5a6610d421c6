"""Cross-cutting utilities (reference utils.py equivalents + TPU extras).

  - AverageMeter: running averages (reference utils.py:44-60)
  - complexity_computation: FLOPs/param counting via XLA cost analysis
    (reference utils.py:20-40 used thop; flops = 2*MACs convention there —
    XLA reports true flops, which already count multiply and add)
  - seed_everything / prng_seq: reproducibility (reference utils.py:63-69
    mutates global seeds; here PRNG key chains)
  - profile_trace: jax.profiler trace context for TPU timeline capture
  - debug_nans: toggle jax_debug_nans for fault isolation
  - device_sync: force a real device round-trip (block_until_ready does not
    synchronize through the axon tunnel)
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def param_count(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def complexity_computation(model, input_channels: int, sequence_len: int,
                           variables=None):
    """(flops, params) for one forward pass on a (1, C, L) input.

    Mirrors the reference probe (utils.py:20-28). FLOPs come from XLA's cost
    analysis of the lowered forward; falls back to 0 if the backend does not
    report them.
    """
    x = jnp.zeros((1, input_channels, sequence_len), jnp.float32)
    if variables is None:
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=False)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    lowered = jax.jit(fwd).lower(variables, x)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0
    return flops, param_count(variables.get("params", variables))


def seed_everything(seed: int) -> None:
    """Host-side RNG seeding; device randomness uses explicit PRNG keys."""
    import random
    random.seed(seed)
    np.random.seed(seed)


def prng_seq(seed: int) -> Iterator[jax.Array]:
    """Deterministic infinite PRNG key sequence for a run."""
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def device_sync(x) -> float:
    """Force a real device round-trip and return the fetched scalar.

    Needed for honest timing: a bare block_until_ready returns before remote
    execution completes when running through the axon tunnel.
    """
    return float(jnp.asarray(x).reshape(-1)[0])
