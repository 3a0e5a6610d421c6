"""TPU-native training engine.

Replaces the reference's per-batch Python hot loop (trainer.py:107-113) with
a fully jitted, scan-based epoch: the dataset lives device-resident, each
epoch is ONE dispatch that `lax.scan`s the train step over shuffled batch
indices, and evaluation is a single padded+masked forward. The remainder
batch (drop_last=False, reference dataloader.py:79) runs as a second jitted
step with its own static shape, so BatchNorm sees the same partial batch the
reference does.

Optimizer matches torch.optim.Adam(lr, weight_decay) exactly: weight decay is
COUPLED into the gradient before the Adam moments (not AdamW) —
``optax.chain(add_decayed_weights(wd), scale_by_adam(), scale(-lr))``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


from .algorithms import AlgorithmSpec, resolve_aux_weight


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar, counts optimizer steps (for schedules)


def multistep_lr_schedule(base_lr: float, milestones=(5, 10, 20, 25),
                          gamma: float = 0.5):
    """torch MultiStepLR stepped per batch: scheduler.step() runs after each
    optimizer step, so the lr used at optimizer-step t (0-based) is
    ``base_lr * gamma^|{m in milestones : m <= t}|``."""
    ms = jnp.asarray(milestones)

    def schedule(count):
        n = jnp.sum(count >= ms)
        return base_lr * (gamma ** n)

    return schedule


def make_optimizer(lr: float, weight_decay: float,
                   schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) semantics (coupled decay)."""
    lr_fn = schedule if schedule is not None else lr
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(lr_fn))
    return optax.chain(*parts)


def mse(pred: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - y) ** 2)


class Engine:
    """Single-method, single-run training engine.

    ``model.__call__(x, train)`` returns ``(B, 1)`` predictions or
    ``(pred, aux)`` for models with an auxiliary loss. ``train_params``
    carries the reference hyperparameter values verbatim.
    """

    def __init__(self, model, spec: AlgorithmSpec, train_params: Dict,
                 seed: int = 0, eval_batch_size: Optional[int] = None,
                 mesh=None, precision: str = "fp32",
                 tp_min_dim: int = 256):
        self.model = model
        self.spec = spec
        self.train_params = dict(train_params)
        self.batch_size = int(train_params["batch_size"])
        self.eval_batch_size = int(eval_batch_size or self.batch_size)
        self.num_epochs = int(train_params["num_epochs"])
        self.aux_weight = resolve_aux_weight(spec, train_params)
        self.seed = seed
        # "bf16": forward/backward compute in bfloat16 (native MXU dtype,
        # halves activation HBM traffic) with fp32 master params, fp32
        # optimizer and fp32 loss/metrics. Opt-in — the default keeps
        # bit-level reference parity. New capability vs the reference
        # (torch fp32-only, trainer.py:107-113).
        assert precision in ("fp32", "bf16"), precision
        self.precision = precision
        # Optional (data, model) mesh: batches get sharded over 'data'
        # inside the jitted steps (XLA inserts the gradient psum; uneven
        # batches — drop_last=False remainders — are handled by GSPMD's
        # internal padding). model>1 additionally shards large kernels
        # (last-dim >= tp_min_dim) over 'model' at init. The mesh may span
        # multiple PROCESSES (parallel.multihost): data is then fed
        # per-process via make_array_from_process_local_data and the same
        # jitted steps run SPMD with cross-host collectives.
        self.mesh = mesh
        self.tp_min_dim = tp_min_dim
        if mesh is not None:
            from ..parallel.multihost import is_multiprocess_mesh
            self._multiprocess = is_multiprocess_mesh(mesh)
        else:
            self._multiprocess = False
        # Device-data cache holds STRONG references to the keying host
        # arrays and verifies identity with ``is`` on lookup (an id()-keyed
        # cache can silently serve stale device data after the caller's
        # array is garbage-collected and a new one reuses the id).
        self._data_cache: Dict[str, Any] = {}
        # Per-engine compile-crash fallback state (never process-global):
        # once True, THIS engine's traces run under the conservative
        # recurrence schedule; other engines are unaffected. Events are
        # recorded for the run artifacts (Trainer puts them in the
        # checkpoint extra).
        self.unroll_fallback = False
        self.fallback_events = []

        lr = float(train_params["learning_rate"])
        wd = float(train_params.get("weight_decay", 0.0))
        schedule = (multistep_lr_schedule(lr)
                    if spec.per_batch_multistep else None)
        self.tx = make_optimizer(lr, wd, schedule)

        self._epoch_cache: Dict[Tuple, Tuple] = {}
        self._eval_cache: Dict[Tuple, Callable] = {}

    # ------------------------------------------------------------------ init

    def init_state(self, sample_x: np.ndarray) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        init_rng, self._dropout_base = jax.random.split(rng)
        x0 = jnp.asarray(sample_x[:2])
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng}, x0, train=False)
        params = variables["params"]
        # Plain-dict batch_stats throughout: flax apply's mutable updates
        # come back as plain dicts, and lax.scan requires carry-in/out
        # pytree TYPES to match (a FrozenDict() placeholder for no-BN
        # models like STGNN breaks the epoch scan).
        from flax.core import unfreeze
        batch_stats = unfreeze(variables.get("batch_stats", {}))
        if self.mesh is not None:
            # Place state on the mesh explicitly: large kernels sharded
            # over 'model' (tensor parallelism), everything else
            # replicated. In multi-process jobs every process computed
            # identical init values (same seed), so assembling the global
            # arrays needs no communication.
            from ..parallel.mesh import param_sharding_rule
            from ..parallel.multihost import put_global
            rule = param_sharding_rule(self.mesh, self.tp_min_dim)
            params = jax.tree_util.tree_map(
                lambda leaf: put_global(leaf, self.mesh, rule(leaf)), params)
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
            batch_stats = jax.tree_util.tree_map(
                lambda leaf: put_global(leaf, self.mesh, repl), batch_stats)
        opt_state = self.tx.init(params)
        return TrainState(params, batch_stats, opt_state,
                          jnp.asarray(0, jnp.int32))

    def tp_sharded_param_count(self, params) -> int:
        """Number of parameter leaves actually sharded over the 'model'
        axis (0 when tensor parallelism has no effect for this model)."""
        if self.mesh is None or self.mesh.shape.get("model", 1) <= 1:
            return 0
        from ..parallel.mesh import param_sharding_rule
        from jax.sharding import PartitionSpec as P
        rule = param_sharding_rule(self.mesh, self.tp_min_dim)
        return sum(int(rule(leaf).spec != P())
                   for leaf in jax.tree_util.tree_leaves(params))

    # ------------------------------------------------------------ train step

    def _loss_from_output(self, out, y):
        if isinstance(out, tuple):
            pred, aux = out
        else:
            pred, aux = out, None
        loss = mse(pred, y)
        if aux is not None and self.aux_weight != 0.0:
            loss = loss + self.aux_weight * aux
        return loss

    def _shard_batch(self, x):
        if self.mesh is None:
            return x
        # Uneven batches (drop_last=False remainder, reference
        # dataloader.py:79) shard fine: GSPMD pads the ragged shard
        # internally, so the remainder step trains data-parallel too.
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def _compute_cast(self, tree):
        """fp32 -> bf16 cast for the compute path (no-op at fp32).
        Differentiable: grads flow back as fp32 into the master params."""
        if self.precision != "bf16":
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def _fp32_cast(self, tree):
        if self.precision != "bf16":
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, tree)

    def _make_train_step(self):
        model, tx = self.model, self.tx

        def train_step(params, batch_stats, opt_state, step, x, y, rng):
            x = self._shard_batch(x)
            y = self._shard_batch(y)
            def loss_fn(p):
                # batch_stats stay fp32 through the whole update path: BN in
                # train mode normalizes with BATCH statistics (bf16 compute is
                # fine there) but its running-stat EMA (0.9*old + 0.1*batch)
                # must accumulate in fp32 — at bf16's ~8-bit mantissa the
                # small increments quantize away over training. Passing the
                # fp32 collection makes the EMA promote to fp32 (fp32 state,
                # bf16 batch term), so only compute is quantized, not state.
                out, updates = model.apply(
                    {"params": self._compute_cast(p),
                     "batch_stats": batch_stats},
                    self._compute_cast(x), train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                out = self._fp32_cast(out)
                loss = self._loss_from_output(out, y)
                from flax.core import unfreeze
                new_bs = self._fp32_cast(unfreeze(
                    updates.get("batch_stats", batch_stats)))
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, step + 1, loss

        return train_step

    def _get_epoch_fns(self, n: int):
        """(jitted scan over full batches, jitted remainder step) for n rows."""
        bs = self.batch_size
        n_full, rem = divmod(n, bs)
        key = (n_full, rem)
        if key in self._epoch_cache:
            return self._epoch_cache[key], n_full, rem

        train_step = self._make_train_step()

        # Datasets smaller than one batch (n_full == 0) train entirely via
        # the remainder step; the scan body cannot even be traced then
        # (full-batch slice > operand).
        run_epoch = None
        if n_full:
            run_epoch = self._make_scan_fn(train_step, n_full)

        rem_fn = None
        if rem:
            @jax.jit
            def rem_fn(params, batch_stats, opt_state, step, perm, epoch_rng,
                       x_all, y_all):
                idx = jax.lax.dynamic_slice_in_dim(perm, n_full * bs, rem)
                x = jnp.take(x_all, idx, axis=0)
                y = jnp.take(y_all, idx, axis=0)
                rng = jax.random.fold_in(epoch_rng, n_full)
                return train_step(params, batch_stats, opt_state, step, x, y,
                                  rng)

        self._epoch_cache[key] = (run_epoch, rem_fn)
        return (run_epoch, rem_fn), n_full, rem

    def _make_scan_fn(self, train_step, n_full: int):
        bs = self.batch_size

        @jax.jit
        def run_epoch(params, batch_stats, opt_state, step, perm, epoch_rng,
                      x_all, y_all):
            def body(carry, i):
                params, batch_stats, opt_state, step = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
                x = jnp.take(x_all, idx, axis=0)
                y = jnp.take(y_all, idx, axis=0)
                rng = jax.random.fold_in(epoch_rng, i)
                params, batch_stats, opt_state, step, loss = train_step(
                    params, batch_stats, opt_state, step, x, y, rng)
                return (params, batch_stats, opt_state, step), loss

            carry, losses = jax.lax.scan(
                body, (params, batch_stats, opt_state, step),
                jnp.arange(n_full))
            return carry, losses

        return run_epoch

    # ------------------------------------------------------------------ data

    def _device_data(self, x_train, y_train):
        """Device-resident training arrays, uploaded once per dataset.

        Single-process: a cached ``jnp.asarray`` (saves a full-dataset H2D
        per epoch). Multi-process: globally row-sharded arrays where each
        process uploads only its own slice (rows padded to a shard
        boundary; batch-index permutations run over the real length, so
        padding is never read).
        """
        c = self._data_cache
        if c.get("x") is not x_train or c.get("y") is not y_train:
            if self._multiprocess:
                from ..parallel.multihost import shard_host_rows
                xd = shard_host_rows(np.asarray(x_train), self.mesh)
                yd = shard_host_rows(np.asarray(y_train), self.mesh)
            else:
                xd = jnp.asarray(x_train)
                yd = jnp.asarray(y_train)
            # Keep only the latest dataset resident; the host arrays are
            # retained so their ids cannot be recycled while cached.
            self._data_cache = {"x": x_train, "y": y_train, "dev": (xd, yd)}
        return self._data_cache["dev"]

    # ------------------------------------------------------------------- fit

    def run_epoch(self, state: TrainState, x_train, y_train, epoch: int,
                  shuffle: bool) -> Tuple[TrainState, float]:
        """One full training epoch; returns (state, sample-weighted avg loss).

        ``epoch`` is 1-based as in the reference trainer (trainer.py:104).
        """
        n = x_train.shape[0]
        (epoch_fn, rem_fn), n_full, rem = self._get_epoch_fns(n)

        x_all, y_all = self._device_data(x_train, y_train)

        if shuffle:
            perm_rng = jax.random.fold_in(
                jax.random.PRNGKey(self.seed + 7919), epoch)
            perm = jax.random.permutation(perm_rng, n)
        else:
            perm = jnp.arange(n)
        epoch_rng = jax.random.fold_in(self._dropout_base, epoch)

        params, batch_stats, opt_state, step = (
            state.params, state.batch_stats, state.opt_state, state.step)
        total, count = 0.0, 0
        from ..nn.recurrent import unroll_override
        try:
            with unroll_override(4 if self.unroll_fallback else None):
                if epoch_fn is not None:
                    (params, batch_stats, opt_state, step), losses = epoch_fn(
                        params, batch_stats, opt_state, step,
                        perm, epoch_rng, x_all, y_all)
                    total = float(jnp.sum(losses)) * self.batch_size
                    count = n_full * self.batch_size
                if rem_fn is not None:
                    params, batch_stats, opt_state, step, rloss = rem_fn(
                        params, batch_stats, opt_state, step, perm, epoch_rng,
                        x_all, y_all)
                    total += float(rloss) * rem
                    count += rem
        except Exception as e:  # noqa: BLE001 - backend compile crash
            # Fail-safe against XLA TPU compiler crashes on aggressive
            # schedules (observed: the fusion emitter checks-fails on SOME
            # fully-unrolled Bi-LSTM backward lengths — T=90 dies where
            # T=100 compiles; "Check failed: window.pad_low[i] == 0").
            # Demote THIS engine to the conservative unroll policy
            # (identical math, scoped via a ContextVar — no process-global
            # env mutation), clear its traced-program caches, and retry the
            # epoch once from the unmodified input state.
            if self.unroll_fallback or not self._is_compile_crash(e):
                raise
            self._engage_fallback("train_epoch", epoch, e)
            return self.run_epoch(state, x_train, y_train, epoch, shuffle)
        state = TrainState(params, batch_stats, opt_state, step)
        return state, total / max(count, 1)

    def _engage_fallback(self, where: str, epoch, e: Exception) -> None:
        import logging
        logging.getLogger(__name__).warning(
            "backend compile crash (%s...); retrying %s with the "
            "conservative recurrence schedule (this engine only)",
            repr(e)[:120], where)
        self.unroll_fallback = True
        self.fallback_events.append(
            {"where": where, "epoch": epoch, "error": repr(e)[:200]})
        self._epoch_cache.clear()
        self._eval_cache.clear()

    @staticmethod
    def _is_compile_crash(e: Exception) -> bool:
        # Only runtime/XLA-layer failures qualify (jaxlib surfaces compiler
        # crashes as XlaRuntimeError, a RuntimeError subclass); user-level
        # errors (ValueError, TypeError, ...) always propagate.
        if not isinstance(e, RuntimeError):
            return False
        msg = str(e)
        return any(s in msg for s in (
            "remote_compile", "tpu_compile_helper", "INTERNAL:",
            "Check failed:"))

    # ------------------------------------------------------------------ eval

    def _get_eval_fn(self, n_batches: int, ebs: int):
        key = (n_batches, ebs)
        if key in self._eval_cache:
            return self._eval_cache[key]
        model = self.model

        @jax.jit
        def eval_all(params, batch_stats, x_pad):
            def body(_, i):
                x = jax.lax.dynamic_slice_in_dim(x_pad, i * ebs, ebs)
                x = self._shard_batch(x)
                out = model.apply(
                    {"params": self._compute_cast(params),
                     "batch_stats": self._compute_cast(batch_stats)},
                    self._compute_cast(x), train=False)
                pred = out[0] if isinstance(out, tuple) else out
                return None, pred.reshape(-1).astype(jnp.float32)

            _, preds = jax.lax.scan(body, None, jnp.arange(n_batches))
            preds = preds.reshape(-1)
            if self.mesh is not None:
                # Fully-replicated output: every process can read the whole
                # prediction vector with np.asarray (metrics run on host).
                from jax.sharding import NamedSharding, PartitionSpec as P
                preds = jax.lax.with_sharding_constraint(
                    preds, NamedSharding(self.mesh, P()))
            return preds

        self._eval_cache[key] = eval_all
        return eval_all

    def evaluate(self, state: TrainState, x_test: np.ndarray) -> np.ndarray:
        """Predictions for the full test set (single fused dispatch).

        The set is padded to a batch multiple; padding rows are discarded.
        Eval uses running BN stats and no dropout, so padding is exact.
        """
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
        if self._multiprocess:
            from ..parallel.multihost import replicate_host_array
            x_dev = replicate_host_array(np.asarray(x_pad), self.mesh)
        else:
            x_dev = jnp.asarray(x_pad)
        from ..nn.recurrent import unroll_override
        try:
            with unroll_override(4 if self.unroll_fallback else None):
                preds = eval_fn(state.params, state.batch_stats, x_dev)
        except Exception as e:  # same compile-crash fallback as run_epoch
            if self.unroll_fallback or not self._is_compile_crash(e):
                raise
            self._engage_fallback("evaluate", None, e)
            with unroll_override(4):
                preds = self._get_eval_fn(n_batches, ebs)(
                    state.params, state.batch_stats, x_dev)
        return np.asarray(preds[:n])
