"""Seed-parallel training: the reference's 5-run protocol as ONE program.

The reference's actual workload is ``num_runs`` consecutive runs, seed =
run index (/root/reference/trainer.py:79, main.py:30), each 81 epochs at
batch 100. On a v5e a single batch-100 step of the small tiers is
sub-millisecond — launch-latency bound, 0.4-2% MFU (BASELINE.md MFU
table). :class:`VectorizedEngine` runs ALL seeds simultaneously by
``jax.vmap``-ing the jitted train/eval steps over a leading seed axis:
per-dispatch work is multiplied by the number of seeds on exactly the
tiers that cannot fill the chip, and the whole experiment (not a synthetic
number) finishes correspondingly faster.

Semantics match running :class:`~gnn_rul_tpu.train.engine.Engine` once per
seed: per-seed parameter init streams (PRNGKey(seed)), per-seed shuffle
permutations, per-seed dropout chains, per-seed optimizer/BN state. The
only deviation from bit-equality is float reassociation from batched
matmuls (tested allclose in tests/test_vectorized.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .algorithms import AlgorithmSpec
from .engine import Engine, TrainState


class VectorizedEngine(Engine):
    """Engine running ``seeds`` training runs in lockstep via vmap.

    Every leaf of the train state carries a leading seed axis S. The epoch
    scan is one jit dispatch advancing all S runs by one batch per step;
    evaluation is one dispatch returning (S, n) predictions. Single-device
    by design (the point is to FILL one chip; use the mesh path for
    scale-out of a single run).
    """

    def __init__(self, model, spec: AlgorithmSpec, train_params: Dict,
                 seeds: List[int], eval_batch_size: Optional[int] = None,
                 precision: str = "fp32"):
        super().__init__(model, spec, train_params, seed=int(seeds[0]),
                         eval_batch_size=eval_batch_size, mesh=None,
                         precision=precision)
        self.seeds = [int(s) for s in seeds]

    # ------------------------------------------------------------------ init

    def init_state(self, sample_x: np.ndarray) -> TrainState:
        x0 = jnp.asarray(sample_x[:2])
        keys = jnp.stack([jax.random.PRNGKey(s) for s in self.seeds])
        splits = jax.vmap(jax.random.split)(keys)      # (S, 2, key)
        init_rngs = splits[:, 0]
        self._dropout_base = splits[:, 1]              # (S,) keys

        def one_init(init_rng):
            # Same rng for params and dropout as Engine.init_state.
            return self.model.init({"params": init_rng, "dropout": init_rng},
                                   x0, train=False)

        variables = jax.vmap(one_init)(init_rngs)
        params = variables["params"]
        from flax.core import unfreeze
        batch_stats = unfreeze(variables.get("batch_stats", {}))
        opt_state = jax.vmap(self.tx.init)(params)
        step = jnp.zeros((len(self.seeds),), jnp.int32)
        return TrainState(params, batch_stats, opt_state, step)

    def slice_state(self, state: TrainState, s: int) -> TrainState:
        """Per-seed view of the stacked state (for per-run checkpoints)."""
        take = lambda a: jax.tree_util.tree_map(lambda x: x[s], a)
        return TrainState(take(state.params), take(state.batch_stats),
                          take(state.opt_state), state.step[s])

    # ----------------------------------------------------------- epoch fns

    def _get_epoch_fns(self, n: int):
        bs = self.batch_size
        n_full, rem = divmod(n, bs)
        key = (n_full, rem)
        if key in self._epoch_cache:
            return self._epoch_cache[key], n_full, rem

        train_step = self._make_train_step()
        vstep = jax.vmap(train_step)

        run_epoch = None
        if n_full:
            @jax.jit
            def run_epoch(params, batch_stats, opt_state, step, perm,
                          epoch_rng, x_all, y_all):
                def body(carry, i):
                    params, batch_stats, opt_state, step = carry
                    idx = jax.lax.dynamic_slice_in_dim(
                        perm, i * bs, bs, axis=1)          # (S, bs)
                    x = jnp.take(x_all, idx, axis=0)       # (S, bs, ...)
                    y = jnp.take(y_all, idx, axis=0)
                    rng = jax.vmap(
                        lambda k: jax.random.fold_in(k, i))(epoch_rng)
                    params, batch_stats, opt_state, step, loss = vstep(
                        params, batch_stats, opt_state, step, x, y, rng)
                    return (params, batch_stats, opt_state, step), loss

                carry, losses = jax.lax.scan(
                    body, (params, batch_stats, opt_state, step),
                    jnp.arange(n_full))
                return carry, losses                        # (n_full, S)

        rem_fn = None
        if rem:
            @jax.jit
            def rem_fn(params, batch_stats, opt_state, step, perm, epoch_rng,
                       x_all, y_all):
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, n_full * bs, rem, axis=1)
                x = jnp.take(x_all, idx, axis=0)
                y = jnp.take(y_all, idx, axis=0)
                rng = jax.vmap(
                    lambda k: jax.random.fold_in(k, n_full))(epoch_rng)
                return vstep(params, batch_stats, opt_state, step, x, y, rng)

        self._epoch_cache[key] = (run_epoch, rem_fn)
        return (run_epoch, rem_fn), n_full, rem

    # ------------------------------------------------------------------- fit

    def run_epoch(self, state: TrainState, x_train, y_train, epoch: int,
                  shuffle: bool) -> Tuple[TrainState, np.ndarray]:
        """One epoch for ALL seeds; returns (state, per-seed avg loss (S,)).

        Per-seed permutations reproduce the sequential Engine's stream:
        seed s shuffles with fold_in(PRNGKey(s + 7919), epoch).
        """
        n = x_train.shape[0]
        (epoch_fn, rem_fn), n_full, rem = self._get_epoch_fns(n)
        x_all, y_all = self._device_data(x_train, y_train)
        s_count = len(self.seeds)

        if shuffle:
            perm = jnp.stack([
                jax.random.permutation(
                    jax.random.fold_in(jax.random.PRNGKey(s + 7919), epoch),
                    n)
                for s in self.seeds])
        else:
            perm = jnp.broadcast_to(jnp.arange(n), (s_count, n))
        epoch_rng = jax.vmap(
            lambda k: jax.random.fold_in(k, epoch))(self._dropout_base)

        params, batch_stats, opt_state, step = (
            state.params, state.batch_stats, state.opt_state, state.step)
        total = np.zeros((s_count,), np.float64)
        count = 0
        from ..nn.recurrent import unroll_override
        try:
            with unroll_override(4 if self.unroll_fallback else None):
                if epoch_fn is not None:
                    (params, batch_stats, opt_state, step), losses = epoch_fn(
                        params, batch_stats, opt_state, step,
                        perm, epoch_rng, x_all, y_all)
                    total = np.asarray(
                        jnp.sum(losses, axis=0), np.float64) * self.batch_size
                    count = n_full * self.batch_size
                if rem_fn is not None:
                    params, batch_stats, opt_state, step, rloss = rem_fn(
                        params, batch_stats, opt_state, step, perm, epoch_rng,
                        x_all, y_all)
                    total = total + np.asarray(rloss, np.float64) * rem
                    count += rem
        except Exception as e:  # noqa: BLE001 - same fallback as Engine
            if self.unroll_fallback or not self._is_compile_crash(e):
                raise
            self._engage_fallback("train_epoch", epoch, e)
            return self.run_epoch(state, x_train, y_train, epoch, shuffle)
        state = TrainState(params, batch_stats, opt_state, step)
        return state, total / max(count, 1)

    # ------------------------------------------------------------------ eval

    def _get_eval_fn(self, n_batches: int, ebs: int):
        key = (n_batches, ebs)
        if key in self._eval_cache:
            return self._eval_cache[key]
        model = self.model

        @jax.jit
        def eval_all(params, batch_stats, x_pad):
            def one(params_s, bs_s):
                def body(_, i):
                    x = jax.lax.dynamic_slice_in_dim(x_pad, i * ebs, ebs)
                    out = model.apply(
                        {"params": self._compute_cast(params_s),
                         "batch_stats": self._compute_cast(bs_s)},
                        self._compute_cast(x), train=False)
                    pred = out[0] if isinstance(out, tuple) else out
                    return None, pred.reshape(-1).astype(jnp.float32)

                _, preds = jax.lax.scan(body, None, jnp.arange(n_batches))
                return preds.reshape(-1)

            return jax.vmap(one)(params, batch_stats)       # (S, n_pad)

        self._eval_cache[key] = eval_all
        return eval_all

    def evaluate(self, state: TrainState, x_test: np.ndarray) -> np.ndarray:
        """(S, n) predictions — one fused dispatch for all seeds."""
        n = x_test.shape[0]
        ebs = min(self.eval_batch_size, n)
        n_batches = -(-n // ebs)
        pad = n_batches * ebs - n
        if pad:
            x_pad = np.concatenate(
                [x_test, np.repeat(x_test[-1:], pad, axis=0)], axis=0)
        else:
            x_pad = x_test
        eval_fn = self._get_eval_fn(n_batches, ebs)
        x_dev = jnp.asarray(x_pad)
        from ..nn.recurrent import unroll_override
        try:
            with unroll_override(4 if self.unroll_fallback else None):
                preds = eval_fn(state.params, state.batch_stats, x_dev)
        except Exception as e:
            if self.unroll_fallback or not self._is_compile_crash(e):
                raise
            self._engage_fallback("evaluate", None, e)
            with unroll_override(4):
                preds = self._get_eval_fn(n_batches, ebs)(
                    state.params, state.batch_stats, x_dev)
        return np.asarray(preds[:, :n])
