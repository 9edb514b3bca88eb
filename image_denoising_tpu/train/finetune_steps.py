"""Jitted finetune steps: frozen base, adapter-only gradients.

Freezing is structural: the optimizer state and gradients cover ONLY the
adapter param subtree; base params enter the step as a non-donated constant
argument. Combined with stop_gradient on the base forward (in the wrappers)
this reproduces torch's requires_grad=False + no_grad exactly, with zero
wasted backward FLOPs.

Loss semantics:
* plain     — L1 + λ_grad·gradient  (finetune.py:277-298)
* iqsl      — + λ_iqsl·IQSL         (finetune_iqsl.py / finetune_memory.py)
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..losses import gradient_loss, iqsl_loss, l1_loss
from .state import TrainState

__all__ = ["make_adapter_finetune_step", "make_memory_finetune_step"]


def _total_loss(pred, clean01, lambda_grad, lambda_iqsl, iqsl_cfg):
    loss_l1 = l1_loss(pred, clean01)
    loss_grad = gradient_loss(pred, clean01)
    loss_iq = jnp.zeros(())
    if lambda_iqsl > 0.0:
        loss_iq = iqsl_loss(
            pred, clean01,
            t1=iqsl_cfg["t1"], t2=iqsl_cfg["t2"], tau=iqsl_cfg.get("tau", 0.1),
            margin=iqsl_cfg.get("margin", 0.0),
            ce_factor=iqsl_cfg.get("ce_factor", 0.5),
        )
    total = loss_l1 + lambda_grad * loss_grad + lambda_iqsl * loss_iq
    return total, {"l1": loss_l1, "grad": loss_grad, "iqsl": loss_iq}


def make_adapter_finetune_step(
    wrapper_apply: Callable,
    lambda_grad: float = 0.1,
    lambda_iqsl: float = 0.0,
    iqsl_cfg: Optional[dict] = None,
):
    """Step for DenoiserWithAdapter. State holds adapter params only.

    wrapper_apply({"params": {"base": ..., "adapter": ...}}, noisy) → pred.
    """

    def loss_fn(adapter_params, base_params, clean01, noisy01):
        params = {"base": base_params, "adapter": adapter_params}
        pred = wrapper_apply({"params": params}, noisy01)
        return _total_loss(pred, clean01, lambda_grad, lambda_iqsl, iqsl_cfg or {})

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, base_params, clean01, noisy01):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, base_params, clean01, noisy01
        )
        state = state.apply_gradients(grads)
        return state, {"loss": loss, **parts}

    return step


def make_memory_finetune_step(
    wrapper_apply: Callable,
    lambda_grad: float = 0.1,
    lambda_iqsl: float = 0.0,
    iqsl_cfg: Optional[dict] = None,
):
    """Step for DenoiserWithMemoryAdapter (banks as device-resident args)."""

    def loss_fn(adapter_params, base_params, clean01, noisy01,
                bank_noise_flat, bank_clean, bank_sq_norms):
        params = {"base": base_params, "adapter": adapter_params}
        pred = wrapper_apply(
            {"params": params}, noisy01, bank_noise_flat, bank_clean, bank_sq_norms
        )
        return _total_loss(pred, clean01, lambda_grad, lambda_iqsl, iqsl_cfg or {})

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, base_params, clean01, noisy01,
             bank_noise_flat, bank_clean, bank_sq_norms):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, base_params, clean01, noisy01,
            bank_noise_flat, bank_clean, bank_sq_norms,
        )
        state = state.apply_gradients(grads)
        return state, {"loss": loss, **parts}

    return step
