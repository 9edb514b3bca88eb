"""Neighbor2Neighbor regularized loss.

The reference documents this as the intended training strategy
(``training_script.md:126-156``); the machinery is present but dormant in
``train.py``. Semantics:

    loss1 = mean((f(sub1) − sub2)²)
    loss2 = Λ · mean((diff − (f(noisy)|sub1 − f(noisy)|sub2))²)
    Λ     = epoch / n_epoch · increase_ratio

where f(noisy) is evaluated without gradient (stop_gradient here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["n2n_regularized_loss"]


def n2n_regularized_loss(noisy_sub1_pred, noisy_sub2, noisy_denoised_sub1,
                         noisy_denoised_sub2, lam):
    """All args NHWC half-res sub-images; lam is the Λ schedule value."""
    diff = noisy_sub1_pred - noisy_sub2
    exp_diff = jax.lax.stop_gradient(noisy_denoised_sub1 - noisy_denoised_sub2)
    loss1 = jnp.mean(diff**2)
    loss2 = lam * jnp.mean((diff - exp_diff) ** 2)
    return loss1 + loss2, (loss1, loss2)
