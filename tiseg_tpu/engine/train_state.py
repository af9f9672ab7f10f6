"""TrainState + jitted step factories (pjit data parallelism).

The hot loop: one jit-compiled ``train_step(state, batch) -> (state, logs)``
with the batch sharded over the mesh 'data' axis and the state replicated.
XLA inserts the gradient all-reduce over ICI — the TPU-native replacement
for DDP/NCCL (reference tiseg/apis/train.py:83-97).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def make_train_step(segmentor, mesh: Optional[Mesh] = None, donate: bool = True) -> Callable:
    """Build the jitted train step. ``segmentor.loss`` must be pure."""

    base_key = jax.random.PRNGKey(0)

    def train_step(state: TrainState, batch: Dict):
        rng = jax.random.fold_in(base_key, state.step)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            total, (logs, new_model_state) = segmentor.loss(variables, batch, train=True, rng=rng)
            return total, (logs, new_model_state)

        grads, (logs, new_model_state) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_model_state['batch_stats'])
        return new_state, logs

    if mesh is not None:
        state_sharding = NamedSharding(mesh, P())
        batch_sharding = NamedSharding(mesh, P('data'))
        # prefix pytrees: replicate the whole state, shard every batch leaf
        return jax.jit(train_step,
                       in_shardings=(state_sharding, batch_sharding),
                       out_shardings=(state_sharding, state_sharding),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(segmentor, ori_hw=None) -> Callable:
    """Jitted TTA+split inference step for fixed-size inputs."""

    @jax.jit
    def eval_step(variables, img):
        return segmentor.inference(variables, img, ori_hw=ori_hw)

    return eval_step
