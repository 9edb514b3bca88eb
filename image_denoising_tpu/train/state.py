"""Train state: params + Adam state + step/guard counters, as a pytree."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state"]


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    skipped: jnp.ndarray  # int32 scalar — guard-rejected batches
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params, opt_state=new_opt, step=self.step + 1
        )


def create_train_state(params, lr: float = 3e-4, weight_decay: float = 0.0) -> TrainState:
    """Adam with injectable learning rate (per-epoch MultiStepLR host control).

    ``weight_decay`` reproduces torch Adam's coupled L2 semantics (grad +=
    wd·param BEFORE the moment updates — train_opt.py:253), NOT decoupled
    AdamW.
    """
    if weight_decay:
        def adam_l2(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(),
                optax.scale(-learning_rate),
            )

        tx = optax.inject_hyperparams(adam_l2)(learning_rate=lr)
    else:
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return TrainState(
        params=params,
        # jitted: eager per-leaf zeros_like dispatch is a round trip per op on
        # remote-transport TPU backends
        opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32),
        skipped=jnp.zeros((), jnp.int32),
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Update the injected hyperparam (host-side, cheap)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state
