"""Experiment runner: multi-run training with best-RMSE tracking.

Mirrors the reference GNN_RUL_trainer contract (trainer.py:25-262):
  - num_runs consecutive runs, seed = run index
  - per-epoch train + FULL test evaluation
  - 4 metrics (Score_v1, Score_v2, MAE, RMSE); best row selected by min RMSE
  - artifacts per run directory: ``results.csv`` (all best rows so far,
    rewritten each epoch), ``results.npz`` (best predictions), and a final
    checkpoint; dict-style test sets (N-CMAPSS per-unit, PHM2012
    per-bearing) produce per-key artifacts
  - periodic checkpoints + resume (a capability the reference lacks)
"""

from __future__ import annotations

import csv
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import numpy as np

from ..configs import hparams as hparams_bank
from ..configs.data_configs import get_dataset_config
from ..data.loader import DataBundle
from .algorithms import get_algorithm_spec
from .engine import Engine
from .metrics import calc_metrics
from .checkpoint import AsyncCheckpointer, save_checkpoint

METRIC_NAMES = ("Score_v1", "Score_v2", "MAE", "RMSE")


def _make_logger(log_dir: str, run_id: int,
                 write: bool = True) -> logging.Logger:
    """Per-run logger. ``write=False`` (non-main processes in a multi-host
    job) returns a silent logger — log files and stdout are host-0-only."""
    name = os.path.join(log_dir, f"logs_run_{run_id}.log")
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    logger.propagate = False
    if not write:
        logger.addHandler(logging.NullHandler())
        return logger
    os.makedirs(log_dir, exist_ok=True)
    fmt = logging.Formatter("%(message)s")
    for handler in (logging.StreamHandler(sys.stdout),
                    logging.FileHandler(name, mode="a")):
        handler.setFormatter(fmt)
        logger.addHandler(handler)
    return logger


class BestTracker:
    """Best-RMSE row tracking with the reference CSV schema
    (trainer.py:196-262)."""

    def __init__(self, save_path: str, key: Optional[Any] = None,
                 write_artifacts: bool = True):
        self.rows = []  # list of 4-tuples
        self.save_path = save_path
        # Host-0-only artifact writes in multi-host jobs; tracking state
        # stays consistent on every process.
        self.write_artifacts = write_artifacts
        # Reference converts float keys (N-CMAPSS unit ids) to int in
        # artifact names (trainer.py:214-217).
        if isinstance(key, float):
            key = int(key)
        self.key = key

    def update(self, metrics, preds, reals, max_rul) -> bool:
        improved = not self.rows or metrics[3] < self.rows[-1][3]
        if improved:
            self.rows.append(tuple(metrics))
            if self.write_artifacts:
                tag = f"{self.key}_" if self.key is not None else ""
                np.savez(os.path.join(self.save_path, f"{tag}results.npz"),
                         pre=preds, real=reals, max_rul=max_rul)
        if self.write_artifacts:
            self._write_csv()
        return improved

    def _write_csv(self):
        tag = f"{self.key}_" if self.key is not None else ""
        path = os.path.join(self.save_path, f"{tag}results.csv")
        with open(path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(METRIC_NAMES)
            writer.writerows(self.rows)

    @property
    def best(self):
        return self.rows[-1] if self.rows else None


class Trainer:
    """End-to-end experiment runner for one (dataset, sub_id, method)."""

    def __init__(self, method: str, dataset: str, dataset_id: Optional[str],
                 data: DataBundle, save_dir: str = "experiments_logs",
                 experiment_description: str = "exp",
                 run_description: str = "run",
                 num_runs: int = 1,
                 train_params: Optional[Dict] = None,
                 model_hparams: Optional[Dict] = None,
                 checkpoint_every: int = 0,
                 mesh=None,
                 resume: bool = False,
                 precision: str = "fp32",
                 fused: str = "auto",
                 num_epochs_override: Optional[int] = None,
                 profile_dir: Optional[str] = None,
                 vectorized_runs: bool = False):
        self.method = method
        self.dataset = dataset
        self.dataset_id = dataset_id
        self.data = data
        self.num_runs = num_runs
        self.checkpoint_every = checkpoint_every
        self.mesh = mesh
        self.resume = resume
        self.precision = precision
        self.fused = fused
        self.profile_dir = profile_dir
        # Seed-parallel protocol: vmap the jitted steps over the run axis so
        # all num_runs seeds train as ONE program (train.vectorized). The
        # big win on latency-bound tiers where batch 100 cannot fill a chip.
        self.vectorized_runs = vectorized_runs
        if vectorized_runs and mesh is not None:
            raise ValueError(
                "--vectorized_runs is a single-device capability (it fills "
                "one chip with the seed axis); drop --mesh or the flag")
        if vectorized_runs and resume:
            raise ValueError(
                "--vectorized_runs does not support --resume (runs advance "
                "in lockstep; resume per-run with the sequential path)")

        self.dataset_config = get_dataset_config(dataset)
        self.train_params = dict(train_params or hparams_bank.train_params(
            dataset, dataset_id, method))
        if num_epochs_override:
            self.train_params["num_epochs"] = int(num_epochs_override)
        self.model_hparams = model_hparams or hparams_bank.model_hparams(
            dataset, dataset_id, method)
        self.spec = get_algorithm_spec(method)

        # Host-0-only artifacts in multi-host jobs (SURVEY §5: host-0-only
        # logging; the reference is single-process).
        from ..parallel.multihost import is_main_process
        self.is_main = is_main_process()

        if precision == "bf16":
            from .precision import bf16_guidance
            msg = bf16_guidance(method, dataset)
            if msg and self.is_main:
                logging.getLogger(__name__).warning(msg)
        if vectorized_runs:
            from .precision import vectorized_guidance
            msg = vectorized_guidance(method, dataset)
            if msg and self.is_main:
                logging.getLogger(__name__).warning(msg)

        self.exp_log_dir = os.path.join(save_dir, experiment_description,
                                        run_description)
        if self.is_main:
            os.makedirs(self.exp_log_dir, exist_ok=True)

    def _build_engine(self, seed: int) -> Engine:
        kwargs = dict(self.model_hparams)
        if self.spec.supports_fused:
            kwargs["fused"] = self.fused
        n_model = (self.mesh.shape.get("model", 1)
                   if self.mesh is not None else 1)
        if n_model > 1 and self.spec.supports_spmm_fn:
            # Route the model's graph aggregation through the node-sharded
            # engine: the dense (N, N) graph algebra splits over the
            # 'model' axis (all-gather boundary exchange, local SDDMM/
            # softmax/SpMM/attention panels). The hook shape is
            # method-specific — see graph_partition.spmm_hook_kwargs.
            from ..parallel.graph_partition import spmm_hook_kwargs
            kwargs.update(spmm_hook_kwargs(self.method, self.mesh))
        return Engine(self.spec.model_cls(**kwargs), self.spec,
                      self.train_params, seed=seed, mesh=self.mesh,
                      precision=self.precision)

    def _check_model_axis(self, engine: Engine, state) -> None:
        """Reject an inert ``model`` axis: if neither the spmm hook nor
        tensor-parallel param sharding applies, model>1 would silently be
        pure replication — raise instead of pretending to scale."""
        n_model = (self.mesh.shape.get("model", 1)
                   if self.mesh is not None else 1)
        if n_model <= 1 or self.spec.supports_spmm_fn:
            return
        if engine.tp_sharded_param_count(state.params) == 0:
            raise ValueError(
                f"--mesh model={n_model} has no effect for {self.method}: "
                f"no kernel is wide enough to shard (tp_min_dim="
                f"{engine.tp_min_dim}) and the model has no spmm_fn hook. "
                f"Use model=1 (pure data parallelism) instead.")

    def _evaluate_and_track(self, engine, state, trackers, run_dir, logger):
        if self.data.is_dict_test:
            for key, (tx, ty) in self.data.test.items():
                preds = engine.evaluate(state, tx)
                reals = ty.reshape(-1)
                mr = self.data.max_ruls[key] if isinstance(
                    self.data.max_ruls, dict) else self.data.max_ruls
                m = calc_metrics(preds, reals, mr)
                trackers[key].update(m, preds, reals, mr)
                b = trackers[key].best
                logger.debug(
                    f"Testing {key}, Score_v1: {b[0]}, Score_v2: {b[1]}, "
                    f"MAE: {b[2]}, RMSE: {b[3]}")
        else:
            tx, ty = self.data.test
            preds = engine.evaluate(state, tx)
            reals = ty.reshape(-1)
            mr = self.data.max_ruls
            m = calc_metrics(preds, reals, mr)
            trackers[None].update(m, preds, reals, mr)
            b = trackers[None].best
            logger.debug(
                f"Testing, Score_v1: {b[0]}, Score_v2: {b[1]}, "
                f"MAE: {b[2]}, RMSE: {b[3]}")

    def evaluate_only(self, variables: Dict) -> Dict:
        """Evaluate imported model variables (e.g. from
        ``gnn_rul_tpu.compat.import_torch_checkpoint``) on the test set.

        Returns {key_or_None: (Score_v1, Score_v2, MAE, RMSE)} and writes
        the reference CSV/npz artifacts under the run directory.
        """
        from flax.core import FrozenDict
        from .engine import TrainState

        run_dir = os.path.join(self.exp_log_dir, f"{self.method}_eval")
        if self.is_main:
            os.makedirs(run_dir, exist_ok=True)
        logger = _make_logger(run_dir, 0, write=self.is_main)
        engine = self._build_engine(seed=0)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=None, step=np.int32(0))
        if self.data.is_dict_test:
            trackers = {k: BestTracker(run_dir, key=k,
                                       write_artifacts=self.is_main)
                        for k in self.data.test}
        else:
            trackers = {None: BestTracker(run_dir,
                                          write_artifacts=self.is_main)}
        self._evaluate_and_track(engine, state, trackers, run_dir, logger)
        return {k: t.best for k, t in trackers.items()}

    def _build_vectorized_engine(self, seeds):
        from .vectorized import VectorizedEngine
        kwargs = dict(self.model_hparams)
        if self.spec.supports_fused:
            kwargs["fused"] = self.fused
        return VectorizedEngine(self.spec.model_cls(**kwargs), self.spec,
                                self.train_params, seeds=seeds,
                                precision=self.precision)

    def _train_vectorized(self) -> Dict[int, Dict]:
        """All num_runs seeds in lockstep: one vmapped epoch dispatch and
        one vmapped eval dispatch per epoch — same per-seed semantics,
        same artifacts (per-run dirs/CSVs/npz/checkpoints) as the
        sequential path."""
        seeds = list(range(self.num_runs))
        engine = self._build_vectorized_engine(seeds)
        state = engine.init_state(self.data.train_x)

        run_dirs, loggers, trackers = [], [], []
        for run_id in seeds:
            run_dir = os.path.join(self.exp_log_dir,
                                   f"{self.method}_run_{run_id}")
            if self.is_main:
                os.makedirs(run_dir, exist_ok=True)
            logger = _make_logger(run_dir, run_id, write=self.is_main)
            logger.debug("=" * 45)
            logger.debug(f"Dataset: {self.dataset}")
            logger.debug(f"Sub-dataset ID: {self.dataset_id}")
            logger.debug(f"Method: {self.method} (vectorized over "
                         f"{self.num_runs} seeds)")
            logger.debug(f"Run ID: {run_id}")
            logger.debug("=" * 45)
            if self.data.is_dict_test:
                tr = {k: BestTracker(run_dir, key=k,
                                     write_artifacts=self.is_main)
                      for k in self.data.test}
            else:
                tr = {None: BestTracker(run_dir,
                                        write_artifacts=self.is_main)}
            run_dirs.append(run_dir)
            loggers.append(logger)
            trackers.append(tr)

        num_epochs = int(self.train_params["num_epochs"])
        shuffle = self.dataset_config.shuffle
        n_train = int(self.data.train_x.shape[0])
        for epoch in range(1, num_epochs + 1):
            t0 = time.time()
            state, losses = engine.run_epoch(
                state, self.data.train_x, self.data.train_y, epoch,
                shuffle=shuffle)
            dt = time.time() - t0
            sps = n_train * self.num_runs / max(dt, 1e-9)
            for run_id in seeds:
                loggers[run_id].debug(f"[Epoch : {epoch}/{num_epochs}]")
                loggers[run_id].debug(
                    f"loss\t: {losses[run_id]:2.4f}\t({dt:.2f}s | "
                    f"{sps:,.0f} samples/s all-seeds)")

            def eval_and_track(tx, ty, key, mr):
                preds_all = engine.evaluate(state, tx)      # (S, n)
                reals = ty.reshape(-1)
                for run_id in seeds:
                    m = calc_metrics(preds_all[run_id], reals, mr)
                    trackers[run_id][key].update(
                        m, preds_all[run_id], reals, mr)
                    b = trackers[run_id][key].best
                    tag = f" {key}," if key is not None else ","
                    loggers[run_id].debug(
                        f"Testing{tag} Score_v1: {b[0]}, Score_v2: {b[1]}, "
                        f"MAE: {b[2]}, RMSE: {b[3]}")

            if self.data.is_dict_test:
                for key, (tx, ty) in self.data.test.items():
                    mr = self.data.max_ruls[key] if isinstance(
                        self.data.max_ruls, dict) else self.data.max_ruls
                    eval_and_track(tx, ty, key, mr)
            else:
                tx, ty = self.data.test
                eval_and_track(tx, ty, None, self.data.max_ruls)
            for run_id in seeds:
                loggers[run_id].debug("-" * 37)

        if self.is_main:
            for run_id in seeds:
                save_checkpoint(
                    os.path.join(run_dirs[run_id], "checkpoint.pkl"),
                    engine.slice_state(state, run_id),
                    extra={"epoch": num_epochs, "run_id": run_id,
                           "hparams": dict(self.model_hparams),
                           "train_params": dict(self.train_params),
                           "vectorized_runs": self.num_runs,
                           "fallback_events": list(engine.fallback_events)})
        return {run_id: {k: t.best for k, t in trackers[run_id].items()}
                for run_id in seeds}

    def train(self) -> Dict[int, Dict]:
        """Run all seeds; returns {run_id: {key_or_None: best 4-tuple}}."""
        if self.vectorized_runs:
            return self._train_vectorized()
        all_results = {}
        ckptr = AsyncCheckpointer()
        for run_id in range(self.num_runs):
            run_dir = os.path.join(self.exp_log_dir,
                                   f"{self.method}_run_{run_id}")
            if self.is_main:
                os.makedirs(run_dir, exist_ok=True)
            logger = _make_logger(run_dir, run_id, write=self.is_main)
            logger.debug("=" * 45)
            logger.debug(f"Dataset: {self.dataset}")
            logger.debug(f"Sub-dataset ID: {self.dataset_id}")
            logger.debug(f"Method: {self.method}")
            logger.debug(f"Run ID: {run_id}")
            logger.debug("=" * 45)

            engine = self._build_engine(seed=run_id)
            state = engine.init_state(self.data.train_x)
            self._check_model_axis(engine, state)

            # Per-step observability (SURVEY §5 row 1): edges/sample is
            # static per (method, hparams) — one abstract trace, reused
            # every epoch for the edges/s counter.
            try:
                from ..ops.edge_count import edges_per_sample
                eps_count = edges_per_sample(engine.model, self.data.train_x)
            except Exception:
                eps_count = 0
            logger.debug(f"Edges per sample: {eps_count}")

            # Resume from a periodic checkpoint if present (a capability the
            # reference lacks — its only checkpoint is final, trainer.py:125).
            # Multi-process: checkpoints are host-0-only and the FS may not
            # be shared, so process 0 decides whether a checkpoint exists and
            # its payload (state AND start epoch) is broadcast to all
            # processes — no desync, no divergent epoch loops.
            start_epoch = 1
            ckpt_path = os.path.join(run_dir, "checkpoint.pkl")
            if self.resume:
                from ..parallel.multihost import is_multiprocess_mesh
                multi = is_multiprocess_mesh(self.mesh)
                exists = os.path.exists(ckpt_path)
                if multi:
                    from jax.experimental import multihost_utils
                    exists = bool(multihost_utils.broadcast_one_to_all(
                        np.asarray(exists)))
                if exists:
                    from .checkpoint import restore_state
                    state, extra = restore_state(ckpt_path, state,
                                                 broadcast=multi)
                    start_epoch = int(extra.get("epoch", 0)) + 1
                    logger.debug(f"Resumed from epoch {start_epoch - 1}")

            if self.data.is_dict_test:
                trackers = {k: BestTracker(run_dir, key=k,
                                           write_artifacts=self.is_main)
                            for k in self.data.test}
            else:
                trackers = {None: BestTracker(run_dir,
                                              write_artifacts=self.is_main)}

            num_epochs = int(self.train_params["num_epochs"])
            shuffle = self.dataset_config.shuffle
            n_train = int(self.data.train_x.shape[0])
            profiling = None
            for epoch in range(start_epoch, num_epochs + 1):
                if self.profile_dir and epoch == start_epoch + 1:
                    # Profile the 2nd epoch (the 1st pays compilation).
                    # Fail-soft: remote-tunnel backends may not support
                    # trace capture.
                    import jax
                    try:
                        jax.profiler.start_trace(self.profile_dir)
                        profiling = epoch
                    except Exception as e:
                        logger.debug(f"profiler unavailable: {e!r}")
                        self.profile_dir = None
                t0 = time.time()
                state, loss = engine.run_epoch(
                    state, self.data.train_x, self.data.train_y, epoch,
                    shuffle=shuffle)
                dt = time.time() - t0
                if profiling == epoch:
                    import jax
                    jax.profiler.stop_trace()
                    logger.debug(f"Profiler trace -> {self.profile_dir}")
                    profiling = None
                sps = n_train / max(dt, 1e-9)
                logger.debug(f"[Epoch : {epoch}/{num_epochs}]")
                logger.debug(f"loss\t: {loss:2.4f}\t({dt:.2f}s | "
                             f"{sps:,.0f} samples/s | "
                             f"{sps * eps_count:,.3g} edges/s)")
                self._evaluate_and_track(engine, state, trackers, run_dir,
                                         logger)
                logger.debug("-" * 37)
                if (self.is_main and self.checkpoint_every
                        and epoch % self.checkpoint_every == 0):
                    # Async: D2H + pickle + atomic write happen off-thread;
                    # the epoch loop never blocks on checkpoint IO.
                    ckptr.save(
                        os.path.join(run_dir, "checkpoint.pkl"), state,
                        extra={"epoch": epoch, "run_id": run_id,
                               "fallback_events": list(
                                   engine.fallback_events)})

            if start_epoch > num_epochs:
                # Resume found a checkpoint at (or past) the final epoch:
                # nothing to train, but still produce results/artifacts by
                # evaluating the restored state once.
                self._evaluate_and_track(engine, state, trackers, run_dir,
                                         logger)

            if self.is_main:
                ckptr.wait()
                if engine.fallback_events:
                    logger.debug(
                        f"compile-crash fallback engaged this run: "
                        f"{engine.fallback_events}")
                save_checkpoint(
                    os.path.join(run_dir, "checkpoint.pkl"), state,
                    extra={"epoch": num_epochs, "run_id": run_id,
                           "hparams": dict(self.model_hparams),
                           "train_params": dict(self.train_params),
                           "fallback_events": list(engine.fallback_events)})
            all_results[run_id] = {k: t.best for k, t in trackers.items()}
        ckptr.close()
        return all_results
