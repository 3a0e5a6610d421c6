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



from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .init import uniform_bound


def _rnn_init(hidden: int):
    return uniform_bound(1.0 / np.sqrt(hidden))


# Context-scoped unroll cap: the engine's compile-crash fallback demotes
# ITS OWN traces to a conservative schedule without mutating process-global
# state (env vars) — other engines in the same process keep full unrolling.
import contextlib
import contextvars

_UNROLL_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "gnnrul_lstm_unroll_override", default=None)


@contextlib.contextmanager
def unroll_override(value: Optional[int]):
    """Scope an unroll-policy override to the enclosed traces (None = no
    override). Used by train.engine's compile-crash fallback."""
    tok = _UNROLL_OVERRIDE.set(value)
    try:
        yield
    finally:
        _UNROLL_OVERRIDE.reset(tok)


_LSTM_IMPL_OVERRIDE: contextvars.ContextVar = contextvars.ContextVar(
    "gnnrul_lstm_impl_override", default=None)


@contextlib.contextmanager
def lstm_impl_override(impl: Optional[str]):
    """Scope an LSTM implementation override to the enclosed traces.

    ``"scan"`` disables the Pallas whole-recurrence dispatch — used by
    :mod:`gnn_rul_tpu.export`, whose multi-platform StableHLO artifacts
    must stay free of backend-specific custom calls. Inference cost is
    unchanged: the kernel's measured win is in the BACKWARD; forward-only
    the scan is even-to-ahead (bench_profile, corrected harness, T=256
    fwd: scan 3.08 vs pallas 3.99 ms)."""
    tok = _LSTM_IMPL_OVERRIDE.set(impl)
    try:
        yield
    finally:
        _LSTM_IMPL_OVERRIDE.reset(tok)


def _auto_unroll(unroll: int, t, b=None) -> int:
    """0 = auto. On TPU, FULLY unroll sequences up to 128 steps: the
    recurrence becomes a straight-line program XLA schedules tightly —
    measured on v5e (LOGO_bearing/XJTU trunk, B=544 T=100 H=30, fwd+bwd):
    unroll=4 13.98 ms, 10/20/25/50 22-25 ms (partial unroll LOSES), full
    unroll 5.74 ms (2.4x; end-to-end tier 6,342 -> 15,105 samples/s).
    Costs ~45 s extra compile per model, paid once.

    ``b`` (the recurrence batch, passed by the bidirectional fused path):
    full unroll of the 6-scan Bi-LSTM stacks LOSES at small batches —
    measured end-to-end A/B on LOGO_bearing/PHM2012 (B=200): full unroll
    10,009 samples/s vs unroll=4 21,961 — so the bidirectional path only
    fully unrolls at B >= 384. Unidirectional layers win at every measured
    batch (GAT_LSTM B=100: PHM 157k->165k, XJTU 119k->210k samples/s).

    On CPU (tests) keep the cheap-compile 4-way policy; the math is
    identical either way. GNNRUL_LSTM_UNROLL=<n> overrides for experiments.
    """
    if not isinstance(t, int):
        # Symbolic scan length (shape-polymorphic export): the trip count
        # is unknown at trace time, so the loop cannot unroll.
        return 1
    if unroll > 0:
        return unroll
    ov = _UNROLL_OVERRIDE.get()
    if ov is not None:  # engine-scoped compile-crash fallback
        return min(int(ov), t)
    import os
    env = os.environ.get("GNNRUL_LSTM_UNROLL")
    if env:  # experiment escape hatch, e.g. GNNRUL_LSTM_UNROLL=4
        return min(int(env), t)
    import jax
    if (t <= 128 and jax.default_backend() != "cpu"
            and (b is None or (isinstance(b, int) and b >= 384))):
        # Symbolic b (shape-polymorphic export) takes the conservative
        # branch: the >=384 crossover cannot be checked at trace time.
        return t
    # Never emit a rolled unroll=1 scan: XLA (CPU and TPU alike) was
    # observed to miscompile the TRANSPOSE of a vmapped rolled scan at
    # unroll=1 inside the LOGO_bearing trunk (seed-parallel runner, T=20:
    # jitted grad of bi_lstm2_bwd/w_ih came out inf while the un-jitted
    # vmapped grad and every per-seed jitted grad of the same jaxpr are
    # finite and ~1e-4). unroll>=4 restructures the loop body enough to
    # dodge it, and was separately measured to match-or-beat unroll=1
    # throughput at every tier. min(4, t) keeps short recurrences exact.
    return 4 if t >= 32 else min(4, t)


class LSTMLayer(nn.Module):
    """Single-direction single-layer LSTM.

    ``unroll`` unrolls the lax.scan body (TPU: reduces loop overhead for
    small per-step matmuls at some compile-time cost); 0 = auto.
    """
    hidden: int
    reverse: bool = False
    unroll: int = 0

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
                                    unroll=_auto_unroll(self.unroll, t))
        return jnp.swapaxes(ys, 0, 1), (hn, cn)


class _LSTMParams(nn.Module):
    """Parameter-only LSTM cell: declares the same w_ih/w_hh/b_ih/b_hh tree
    as LSTMLayer (so torch weight-import mappings are unchanged) without
    running a scan — used by the fused bidirectional path."""
    hidden: int

    @nn.compact
    def __call__(self, d: int):
        init = _rnn_init(self.hidden)
        return (self.param("w_ih", init, (d, 4 * self.hidden)),
                self.param("w_hh", init, (self.hidden, 4 * self.hidden)),
                self.param("b_ih", init, (4 * self.hidden,)),
                self.param("b_hh", init, (4 * self.hidden,)))


def _lstm_cell_math(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    return jax.nn.sigmoid(o) * jnp.tanh(c), c


def bilstm_fused(x, params_fwd, params_bwd, unroll: int = 0,
                 impl: str = "auto"):
    """Run forward+backward LSTM directions in ONE lax.scan.

    Halves the sequential scan count vs two separate LSTMLayers and fuses
    the two per-step (B, H) @ (H, 4H) recurrences into one batched matmul
    (2, B, H) @ (2, H, 4H) — one MXU dispatch per step instead of two.
    Numerically identical to running the directions separately.

    ``impl``: "scan" = lax.scan with the measured unroll policy (full
    unroll on TPU at T<=128 — the fastest path on v5e); "pallas" = the
    Pallas whole-recurrence kernel (bit-exact). "auto" = measured
    dispatch: the kernel WINS training at long T where full unroll stops
    being compilable and the scan pays loop overhead — fwd+bwd on v5e
    (bench_profile --target lstm, H=30, corrected all-leaves-live
    harness): T=256 3.31 vs 4.65 ms (1.41x), T=512 3.76 vs 5.52 (1.47x),
    T=1024 4.96 vs 7.40 (1.49x) — so "auto" takes the kernel on TPU at
    T >= 256 and the scan below (every reference config has T <= 100 and
    keeps the scan). Forward-only the scan stays even-to-ahead, so
    inference export pins "scan" (lstm_impl_override).

    x: (B, T, D). Returns (ys_fwd, ys_bwd) each (B, T, H), plus
    ((hf, cf), (hb, cb)) final states — identical contract on every impl
    (the Pallas kernel returns its VMEM-resident final cell states too).
    """
    b, t, _ = x.shape
    w_ih_f, w_hh_f, b_ih_f, b_hh_f = params_fwd
    w_ih_b, w_hh_b, b_ih_b, b_hh_b = params_bwd
    hid = w_hh_f.shape[0]

    # Input projections hoisted out of the scan; backward direction's
    # sequence pre-flipped so step i consumes position T-1-i.
    xg_f = jnp.einsum("btd,dg->tbg", x, w_ih_f) + b_ih_f + b_hh_f
    xg_b = jnp.einsum("btd,dg->tbg", x, w_ih_b) + b_ih_b + b_hh_b
    xg = jnp.stack([xg_f, xg_b[::-1]], axis=1)  # (T, 2, B, 4H)

    w_hh = jnp.stack([w_hh_f, w_hh_b])  # (2, H, 4H)

    if _LSTM_IMPL_OVERRIDE.get() is not None:
        impl = _LSTM_IMPL_OVERRIDE.get()
    if (impl == "auto" and isinstance(t, int) and t >= 256
            and jax.default_backend() not in ("cpu", "gpu")
            and _UNROLL_OVERRIDE.get() is None):
        # The engine's compile-crash fallback (unroll_override) also demotes
        # the kernel dispatch back to the conservative scan.
        impl = "pallas"
    if impl == "pallas":
        from ..ops.pallas.fused_lstm import lstm_recurrence_pallas
        interpret = jax.default_backend() in ("cpu", "gpu")
        ys, c_fin = lstm_recurrence_pallas(xg, w_hh, interpret)
        ys_f = jnp.swapaxes(ys[:, 0], 0, 1)
        ys_b = jnp.swapaxes(ys[::-1, 1], 0, 1)
        return ys_f, ys_b, ((ys_f[:, -1], c_fin[0]), (ys_b[:, 0], c_fin[1]))

    h0 = jnp.zeros((2, b, hid), x.dtype)
    c0 = jnp.zeros((2, b, hid), x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.einsum("kbh,khg->kbg", h, w_hh)
        h, c = _lstm_cell_math(gates, c)
        return (h, c), h

    (hn, cn), ys = jax.lax.scan(step, (h0, c0), xg,
                                unroll=_auto_unroll(unroll, t, b))
    ys_f = jnp.swapaxes(ys[:, 0], 0, 1)            # (B, T, H)
    ys_b = jnp.swapaxes(ys[::-1, 1], 0, 1)         # un-flip backward outputs
    return ys_f, ys_b, ((hn[0], cn[0]), (hn[1], cn[1]))


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
            if self.bidirectional:
                d = x.shape[-1]
                pf = _LSTMParams(self.hidden, name=f"l{layer}_fwd")(d)
                pb = _LSTMParams(self.hidden, name=f"l{layer}_bwd")(d)
                fwd, bwd, ((hf, cf), (hb, cb)) = bilstm_fused(x, pf, pb)
                x = jnp.concatenate([fwd, bwd], axis=-1)
                h_last += [hf, hb]
                c_last += [cf, cb]
            else:
                x, (hf, cf) = LSTMLayer(self.hidden, name=f"l{layer}_fwd")(x)
                h_last.append(hf)
                c_last.append(cf)
        h_n = jnp.stack(h_last, axis=0)
        c_n = jnp.stack(c_last, axis=0)
        return x, (h_n, c_n)


class GRULayer(nn.Module):
    """Single-direction single-layer GRU (torch [r, z, n] gate layout).
    ``unroll``: see LSTMLayer (0 = auto)."""
    hidden: int
    reverse: bool = False
    unroll: int = 0

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
                              unroll=_auto_unroll(self.unroll, t))
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
