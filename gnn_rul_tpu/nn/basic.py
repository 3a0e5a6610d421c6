"""Basic flax modules with torch-default semantics.

These wrap flax.linen primitives so that every model in the zoo gets torch
Linear/Conv1d/BatchNorm1d behavior (init distribution, eps/momentum, padding
convention) without repeating boilerplate.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn

import jax.numpy as jnp

from .init import torch_linear_kernel, torch_conv_kernel, fan_in_bias


class Linear(nn.Module):
    """torch.nn.Linear equivalent (acts on the last axis)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel,
            bias_init=fan_in_bias(fan_in),
        )(x)


class _DenseParamLeaf(nn.Module):
    features: int

    @nn.compact
    def __call__(self, d_in: int):
        k = self.param("kernel", torch_linear_kernel, (d_in, self.features))
        b = self.param("bias", fan_in_bias(d_in), (self.features,))
        return k, b


class LinearParams(nn.Module):
    """Parameter-only :class:`Linear`: declares the identical param tree
    ({Dense_0: {kernel, bias}}, same init) but returns (kernel, bias)
    instead of applying the matmul — for callers that batch several
    Linears (e.g. per-head q/k/v projections) into one stacked einsum.
    Numerics of the batched matmul equal the per-head matmuls exactly."""
    features: int

    @nn.compact
    def __call__(self, d_in: int):
        return _DenseParamLeaf(self.features, name="Dense_0")(d_in)


class BatchNorm1d(nn.Module):
    """torch.nn.BatchNorm1d over the LAST axis (caller arranges layout).

    torch semantics: momentum 0.1 (flax momentum = 1 - 0.1 = 0.9), eps 1e-5,
    affine, track_running_stats. ``train=True`` -> batch statistics (and
    running-stat update); ``train=False`` -> running statistics.

    For torch's (B, C, L) convention, transpose so C is last and flatten the
    remaining axes into batch before calling, or use :class:`BatchNormNCL`.
    """
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=None,
        )(x)


class BatchNormNCL(nn.Module):
    """BatchNorm1d applied to (B, C, L) arrays normalizing per-channel over
    (B, L) — the common torch pattern ``transpose -> BN -> transpose``."""

    @nn.compact
    def __call__(self, x, train: bool):
        # (B, C, L) -> (B, L, C): stats reduce over (0, 1).
        xt = jnp.swapaxes(x, -1, -2)
        xt = BatchNorm1d()(xt, train=train)
        return jnp.swapaxes(xt, -1, -2)


class Conv1d(nn.Module):
    """torch.nn.Conv1d equivalent. Input (B, C, L), output (B, C', L').

    ``padding`` is the symmetric int padding of torch (elements added to both
    sides). Dilation/stride supported.
    """
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-2] * self.kernel_size
        # flax Conv expects (B, L, C).
        xt = jnp.swapaxes(x, -1, -2)
        y = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel,
            bias_init=fan_in_bias(fan_in),
        )(xt)
        return jnp.swapaxes(y, -1, -2)


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent. Input (B, C, H, W)."""
    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = x.shape[1] * kh * kw
        xt = jnp.transpose(x, (0, 2, 3, 1))
        y = nn.Conv(
            self.features,
            kernel_size=(kh, kw),
            strides=tuple(self.stride),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel,
            bias_init=fan_in_bias(fan_in),
        )(xt)
        return jnp.transpose(y, (0, 3, 1, 2))


class MLP(nn.Module):
    """Stack of Linear layers with an activation between (not after) them,
    unless ``final_activation`` is set."""
    features: Sequence[int]
    activation: Callable = nn.relu
    final_activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = Linear(f)(x)
            if i < len(self.features) - 1:
                x = self.activation(x)
            elif self.final_activation is not None:
                x = self.final_activation(x)
        return x


class Dropout(nn.Module):
    """torch-style dropout: active only when ``train=True``."""
    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        if self.rate == 0.0:
            return x
        return nn.Dropout(self.rate, deterministic=not train)(x)


def max_pool1d(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0):
    """torch.nn.MaxPool1d on (B, C, L). Padding uses -inf so padded elements
    never win the max."""
    xt = jnp.swapaxes(x, -1, -2)
    y = nn.max_pool(
        xt, window_shape=(kernel,), strides=(stride,),
        padding=[(padding, padding)],
    )
    return jnp.swapaxes(y, -1, -2)
