"""Pixel/frequency-domain losses.

* ``structure_loss`` — α·L1(pred_noisy, clean) + β·TV(pred_clean)
  + γ·L1(pred_clean, clean), the active train.py criterion (``util.py:41-70``).
  TV here is the reference's definition: mean |forward difference| of the
  *clean prediction*, averaged over the two axes.
* ``l1fft_loss`` — α·L1 + β·mean|FFT2(pred) − FFT2(target)| (``util.py:5-38``).
* ``gradient_loss`` — L1 of forward differences (``finetune.py:153-162``).

All functions take NHWC arrays; spatial axes are (1, 2).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1_loss", "l2_loss", "structure_loss", "l1fft_loss", "gradient_loss"]


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def structure_loss(pred, pred2, target, alpha: float = 1.0, beta: float = 0.5,
                   gamma: float = 0.5):
    """pred = net(noisy), pred2 = net(clean), target = clean."""
    pixel = l1_loss(pred, target)
    tv1 = l1_loss(pred2[:, 1:, :, :], pred2[:, :-1, :, :])
    tv2 = l1_loss(pred2[:, :, 1:, :], pred2[:, :, :-1, :])
    tv = (tv1 + tv2) / 2.0
    cst = l1_loss(pred2, target)
    return alpha * pixel + beta * tv + gamma * cst


def l1fft_loss(pred, target, alpha: float = 1.0, beta: float = 1.0):
    pixel = l1_loss(pred, target)
    fp = jnp.fft.fft2(pred, axes=(1, 2))
    ft = jnp.fft.fft2(target, axes=(1, 2))
    freq = jnp.mean(jnp.abs(fp - ft))
    return alpha * pixel + beta * freq


def gradient_loss(pred, target):
    pdx = pred[:, :, 1:, :] - pred[:, :, :-1, :]
    pdy = pred[:, 1:, :, :] - pred[:, :-1, :, :]
    tdx = target[:, :, 1:, :] - target[:, :, :-1, :]
    tdy = target[:, 1:, :, :] - target[:, :-1, :, :]
    return l1_loss(pdx, tdx) + l1_loss(pdy, tdy)
