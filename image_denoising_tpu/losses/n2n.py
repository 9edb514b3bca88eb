"""Neighbor2Neighbor regularized loss.

The reference documents this as the intended training strategy
(``training_script.md:126-156``); the machinery is present but dormant in
``train.py``. Semantics:

    loss1 = mean((f(sub1) − sub2)²)
    loss2 = Λ · mean((diff − (f(noisy)|sub1 − f(noisy)|sub2))²)
    Λ     = epoch / n_epoch · increase_ratio
    total = Λ₁·loss1 + Λ₂·loss2

where f(noisy) is evaluated without gradient (stop_gradient here). Λ₁/Λ₂ are
the upstream N2N recipe's --Lambda1/--Lambda2 weights (both default 1,
matching training_script.md's loss1 + loss2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["n2n_regularized_loss"]


def n2n_regularized_loss(noisy_sub1_pred, noisy_sub2, noisy_denoised_sub1,
                         noisy_denoised_sub2, lam, lambda1: float = 1.0,
                         lambda2: float = 1.0):
    """All args NHWC half-res sub-images; lam is the Λ schedule value."""
    diff = noisy_sub1_pred - noisy_sub2
    exp_diff = jax.lax.stop_gradient(noisy_denoised_sub1 - noisy_denoised_sub2)
    loss1 = jnp.mean(diff**2)
    loss2 = lam * jnp.mean((diff - exp_diff) ** 2)
    return lambda1 * loss1 + lambda2 * loss2, (loss1, loss2)
