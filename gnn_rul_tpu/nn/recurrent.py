"""Recurrent layers as lax.scan loops with torch gate layout.

torch.nn.LSTM packs gates as [i, f, g, o]; GRU as [r, z, n] with
``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``. All weights init
U(-1/sqrt(hidden), 1/sqrt(hidden)). The scan carries (h, c) and the input
sequence is time-major inside the scan (transposed at the boundary), which
is the XLA-friendly layout: one fused matmul per step over the whole batch.

Input convention (torch batch_first=True): (B, T, D). Returns
(outputs (B, T, H*dirs), (h_n, c_n)).
"""

from __future__ import annotations



import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .init import uniform_bound


def _rnn_init(hidden: int):
    return uniform_bound(1.0 / np.sqrt(hidden))


class LSTMLayer(nn.Module):
    """Single-direction single-layer LSTM.

    ``unroll`` unrolls the lax.scan body (TPU: reduces loop overhead for
    small per-step matmuls at some compile-time cost).
    """
    hidden: int
    reverse: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, x, h0=None, c0=None):
        b, t, d = x.shape
        init = _rnn_init(self.hidden)
        w_ih = self.param("w_ih", init, (d, 4 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", init, (4 * self.hidden,))
        b_hh = self.param("b_hh", init, (4 * self.hidden,))

        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), x.dtype)
        if c0 is None:
            c0 = jnp.zeros((b, self.hidden), x.dtype)

        # Hoist the input projection out of the scan: one big MXU matmul.
        xg = jnp.einsum("btd,dg->btg", x, w_ih) + b_ih + b_hh
        xg = jnp.swapaxes(xg, 0, 1)  # (T, B, 4H)

        def step(carry, xt):
            h, c = carry
            gates = xt + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (hn, cn), ys = jax.lax.scan(step, (h0, c0), xg, reverse=self.reverse,
                                    unroll=self.unroll)
        return jnp.swapaxes(ys, 0, 1), (hn, cn)


class LSTM(nn.Module):
    """torch.nn.LSTM(batch_first=True) equivalent: multi-layer, optional
    bidirectional (outputs concatenated [fwd, bwd] on the feature axis)."""
    hidden: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        h_last, c_last = [], []
        for layer in range(self.num_layers):
            fwd, (hf, cf) = LSTMLayer(self.hidden, name=f"l{layer}_fwd")(x)
            if self.bidirectional:
                bwd, (hb, cb) = LSTMLayer(self.hidden, reverse=True,
                                          name=f"l{layer}_bwd")(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
                h_last += [hf, hb]
                c_last += [cf, cb]
            else:
                x = fwd
                h_last.append(hf)
                c_last.append(cf)
        h_n = jnp.stack(h_last, axis=0)
        c_n = jnp.stack(c_last, axis=0)
        return x, (h_n, c_n)


class GRULayer(nn.Module):
    """Single-direction single-layer GRU (torch [r, z, n] gate layout)."""
    hidden: int
    reverse: bool = False
    unroll: int = 1

    @nn.compact
    def __call__(self, x, h0=None):
        b, t, d = x.shape
        init = _rnn_init(self.hidden)
        w_ih = self.param("w_ih", init, (d, 3 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", init, (3 * self.hidden,))
        b_hh = self.param("b_hh", init, (3 * self.hidden,))

        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), x.dtype)

        xg = jnp.einsum("btd,dg->btg", x, w_ih) + b_ih
        xg = jnp.swapaxes(xg, 0, 1)

        def step(h, xt):
            hg = h @ w_hh + b_hh
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn_ = jnp.split(hg, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn_)
            h = (1.0 - z) * n + z * h
            return h, h

        hn, ys = jax.lax.scan(step, h0, xg, reverse=self.reverse,
                              unroll=self.unroll)
        return jnp.swapaxes(ys, 0, 1), hn


class GRU(nn.Module):
    """torch.nn.GRU(batch_first=True) equivalent."""
    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x):
        h_last = []
        for layer in range(self.num_layers):
            x, hn = GRULayer(self.hidden, name=f"l{layer}")(x)
            h_last.append(hn)
        return x, jnp.stack(h_last, axis=0)
