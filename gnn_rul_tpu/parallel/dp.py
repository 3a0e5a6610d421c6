"""Sharded training step over a (data, model) mesh.

Builds the same train-step math as train.engine but with explicit sharding
annotations: the batch is sharded over 'data' (XLA inserts the gradient
psum), large kernels over 'model' (XLA inserts the activation collectives).
No NCCL/MPI analog exists in the reference (SURVEY §2.6) — this is the
TPU-native scaling path.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, shard_params
from ..train.engine import TrainState, make_optimizer, mse


class ShardedTrainer:
    """Data+tensor-parallel train/eval steps for one model.

    Usage::

        mesh = make_mesh(n_data=4, n_model=2)
        st = ShardedTrainer(model, mesh, lr=1e-3, weight_decay=1e-4)
        state = st.init(rng, sample_batch)
        state, loss = st.step(state, x, y, rng)
    """

    def __init__(self, model, mesh, lr: float, weight_decay: float = 0.0,
                 aux_weight: float = 0.0, min_shard_dim: int = 256):
        self.model = model
        self.mesh = mesh
        self.aux_weight = aux_weight
        self.min_shard_dim = min_shard_dim
        self.tx = make_optimizer(lr, weight_decay)
        self._step_fn = None
        self._eval_fn = None

    # ------------------------------------------------------------------ init

    def init(self, rng, sample_x) -> TrainState:
        x0 = jnp.asarray(sample_x)
        variables = self.model.init({"params": rng, "dropout": rng}, x0,
                                    train=False)
        params = shard_params(variables["params"], self.mesh,
                              self.min_shard_dim)
        batch_stats = jax.device_put(
            variables.get("batch_stats", {}),
            NamedSharding(self.mesh, P()))
        opt_state = self.tx.init(params)
        return TrainState(params, batch_stats, opt_state,
                          jnp.asarray(0, jnp.int32))

    # ------------------------------------------------------------------ step

    def _build_step(self):
        model, tx, mesh = self.model, self.tx, self.mesh
        aux_w = self.aux_weight

        def train_step(params, batch_stats, opt_state, step, x, y, rng):
            x = jax.lax.with_sharding_constraint(
                x, batch_sharding(mesh, x.ndim))
            y = jax.lax.with_sharding_constraint(
                y, batch_sharding(mesh, y.ndim))

            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                if isinstance(out, tuple):
                    pred, aux = out
                    loss = mse(pred, y)
                    if aux_w:
                        loss = loss + aux_w * jnp.mean(aux)
                else:
                    loss = mse(out, y)
                return loss, updates.get("batch_stats", batch_stats)

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, step + 1, loss

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def step(self, state: TrainState, x, y, rng):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        x = jax.device_put(jnp.asarray(x), batch_sharding(self.mesh, x.ndim))
        y = jax.device_put(jnp.asarray(y), batch_sharding(self.mesh, y.ndim))
        params, bs, opt, step, loss = self._step_fn(
            state.params, state.batch_stats, state.opt_state, state.step,
            x, y, rng)
        return TrainState(params, bs, opt, step), loss

    # ------------------------------------------------------------------ eval

    def _build_eval(self):
        model, mesh = self.model, self.mesh

        def eval_step(params, batch_stats, x):
            x = jax.lax.with_sharding_constraint(
                x, batch_sharding(mesh, x.ndim))
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              x, train=False)
            pred = out[0] if isinstance(out, tuple) else out
            return pred.reshape(-1)

        return jax.jit(eval_step)

    def evaluate(self, state: TrainState, x):
        if self._eval_fn is None:
            self._eval_fn = self._build_eval()
        x = jax.device_put(jnp.asarray(x), batch_sharding(self.mesh, x.ndim))
        return self._eval_fn(state.params, state.batch_stats, x)
