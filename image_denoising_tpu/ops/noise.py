"""Synthetic noise augmentation (Neighbor2Neighbor recipe).

Reference semantics (``train.py:64-131``): style strings ``gauss<σ>``,
``gauss<σ1>_<σ2>``, ``poisson<λ>``, ``poisson<λ1>_<λ2>``; Gaussian σ is given
in /255 units, Poisson λ in absolute units; range styles draw per-sample
parameters uniformly. Device randomness uses per-op counter-derived keys
(see ``ops/rng.py``). All functions are jit-safe (keys passed in, shapes
static).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax

__all__ = ["AugmentNoise"]


def _parse(style: str) -> Tuple[str, Tuple[float, ...]]:
    if style.startswith("gauss"):
        params = tuple(float(p) / 255.0 for p in style.replace("gauss", "", 1).split("_"))
        return ("gauss_fix" if len(params) == 1 else "gauss_range"), params
    if style.startswith("poisson"):
        params = tuple(float(p) for p in style.replace("poisson", "", 1).split("_"))
        return ("poisson_fix" if len(params) == 1 else "poisson_range"), params
    raise ValueError(f"unknown noise style {style!r}")


class AugmentNoise:
    """Adds synthetic train/valid noise. x is NHWC float in [0,1]."""

    def __init__(self, style: str):
        self.style, self.params = _parse(style)

    # --- device path (train) -------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def add_train_noise(self, key, x):
        b = x.shape[0]
        bshape = (b, 1, 1, 1)
        if self.style == "gauss_fix":
            std = self.params[0]
            return x + jax.random.normal(key, x.shape, x.dtype) * std
        if self.style == "gauss_range":
            min_std, max_std = self.params
            k1, k2 = jax.random.split(key)
            std = jax.random.uniform(k1, bshape, x.dtype, min_std, max_std)
            return x + jax.random.normal(k2, x.shape, x.dtype) * std
        if self.style == "poisson_fix":
            lam = self.params[0]
            return jax.random.poisson(key, lam * x, x.shape).astype(x.dtype) / lam
        if self.style == "poisson_range":
            min_lam, max_lam = self.params
            k1, k2 = jax.random.split(key)
            lam = jax.random.uniform(k1, bshape, x.dtype, min_lam, max_lam)
            return jax.random.poisson(k2, lam * x, x.shape).astype(x.dtype) / lam
        raise AssertionError(self.style)

    # --- host path (validation) ----------------------------------------------
    def add_valid_noise(self, x):
        import numpy as np

        shape = x.shape
        if self.style == "gauss_fix":
            std = self.params[0]
            return np.asarray(x + np.random.normal(size=shape) * std, dtype=np.float32)
        if self.style == "gauss_range":
            min_std, max_std = self.params
            std = np.random.uniform(low=min_std, high=max_std, size=(1, 1, 1))
            return np.asarray(x + np.random.normal(size=shape) * std, dtype=np.float32)
        if self.style == "poisson_fix":
            lam = self.params[0]
            return np.asarray(np.random.poisson(lam * x) / lam, dtype=np.float32)
        if self.style == "poisson_range":
            min_lam, max_lam = self.params
            lam = np.random.uniform(low=min_lam, high=max_lam, size=(1, 1, 1))
            return np.asarray(np.random.poisson(lam * x) / lam, dtype=np.float32)
        raise AssertionError(self.style)
