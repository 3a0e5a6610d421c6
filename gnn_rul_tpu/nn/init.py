"""Initializers reproducing torch layer defaults (distribution-level parity).

torch.nn.Linear / Conv1d default to kaiming_uniform(a=sqrt(5)) on the weight,
which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); the bias uses the same
bound. torch.nn.LSTM/GRU use U(-1/sqrt(hidden), 1/sqrt(hidden)) everywhere.
Exact RNG streams differ from torch — parity tests load identical weights —
but matching distributions keeps 81-epoch training statistically comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """flax Dense kernel (in, out): U(-1/sqrt(in), 1/sqrt(in))."""
    fan_in = shape[0]
    b = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -b, b)


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """flax Conv kernel (k..., in, out): U(-1/sqrt(in*prod(k)), ...)."""
    fan_in = int(np.prod(shape[:-1]))
    b = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -b, b)


def fan_in_bias(fan_in: int):
    b = 1.0 / np.sqrt(fan_in)
    return uniform_bound(b)
