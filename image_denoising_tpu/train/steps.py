"""Jitted train steps.

Each factory returns a single fused step (forward(s) + loss + backward +
Adam update) with ``donate_argnums`` on the state so buffers are reused
in-place on device. Bad-batch guards (train_opt.py:118-160 semantics) run
*inside* the step via ``lax.cond`` — no host sync: a rejected batch applies a
zero update and bumps the ``skipped`` counter.

Normalization (/255) is fused into the step, matching the reference's in-loop
divide (``train.py:356``) while keeping host→device transfers uint8-sized
when the caller passes uint8.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..losses import l1_loss, n2n_regularized_loss, structure_loss
from ..ops.neighbor import generate_mask_pair, generate_subimages
from .state import TrainState

__all__ = [
    "make_structure_train_step",
    "make_l1_train_step",
    "make_n2n_train_step",
]


def _guarded_update(state: TrainState, grads, loss, *, grad_clip: Optional[float],
                    max_loss_skip: Optional[float], max_grad_norm: Optional[float]):
    """Apply grads only when loss/grads pass the guards; else count a skip."""
    gnorm = optax.global_norm(grads)
    ok = jnp.isfinite(loss)
    if max_loss_skip is not None:
        ok &= loss <= max_loss_skip
    ok &= jnp.isfinite(gnorm)
    if max_grad_norm is not None:
        ok &= gnorm <= max_grad_norm * 10.0

    if grad_clip is not None:
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

    def do_update(_):
        return state.apply_gradients(grads)

    def skip(_):
        return state.replace(skipped=state.skipped + 1)

    new_state = jax.lax.cond(ok, do_update, skip, None)
    return new_state, gnorm, ok


def make_structure_train_step(
    apply_fn: Callable,
    alpha: float = 1.0,
    beta: float = 0.5,
    gamma: float = 0.5,
    guards: bool = False,
    grad_clip: Optional[float] = None,
    fused: bool = True,
):
    """A-domain trainer step (train.py:354-368): double forward + Structure loss.

    ``fused=True`` (default) runs the two forwards — network(noisy) and
    network(clean), reference train.py:361 — as ONE concatenated batch-2B
    forward and splits the outputs. Semantically identical (convs, pools and
    GroupNorm are all per-sample; the loss terms are elementwise and split
    after), but at the reference batch of 4 the concat makes every conv a
    batch-8 conv — exactly filling the TPU sublane dim, which keeps XLA off
    its space-to-batch rewrite the same way the eval path's chunk-8 tile scan
    does (docs/PERF.md §3/§5). ``fused=False`` keeps the literal two-forward
    form (used by the step-equivalence test).
    """

    def loss_fn(params, clean01, noisy01):
        if fused:
            b = noisy01.shape[0]
            both = apply_fn(
                {"params": params}, jnp.concatenate([noisy01, clean01], axis=0)
            )
            pred_n, pred_c = both[:b], both[b:]
        else:
            pred_n = apply_fn({"params": params}, noisy01)
            pred_c = apply_fn({"params": params}, clean01)
        loss = structure_loss(pred_n, pred_c, clean01, alpha, beta, gamma)
        l1 = l1_loss(pred_n, clean01)
        return loss, l1

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, clean255, noisy255):
        clean01 = clean255.astype(jnp.float32) / 255.0
        noisy01 = noisy255.astype(jnp.float32) / 255.0
        (loss, l1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, clean01, noisy01
        )
        if guards or grad_clip is not None:
            state, gnorm, ok = _guarded_update(
                state, grads, loss,
                grad_clip=grad_clip,
                max_loss_skip=5.0 if guards else None,
                max_grad_norm=20.0 if guards else None,
            )
        else:
            state = state.apply_gradients(grads)
        return state, {"loss": loss, "l1": l1}

    return step


def make_l1_train_step(apply_fn: Callable, guards: bool = True,
                       grad_clip: Optional[float] = 1.0,
                       inputs_01: bool = True):
    """HPO trainer step (train_opt.py:118-160): L1 loss + full guard set.

    ``inputs_01``: train_opt's dataset already yields [0,1] floats.
    """

    def loss_fn(params, clean01, noisy01):
        pred = apply_fn({"params": params}, noisy01)
        return l1_loss(pred, clean01)

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, clean, noisy):
        scale = 1.0 if inputs_01 else 255.0
        clean01 = clean.astype(jnp.float32) / scale
        noisy01 = noisy.astype(jnp.float32) / scale
        loss, grads = jax.value_and_grad(loss_fn)(state.params, clean01, noisy01)
        state, gnorm, ok = _guarded_update(
            state, grads, loss,
            grad_clip=grad_clip,
            max_loss_skip=5.0 if guards else None,
            max_grad_norm=20.0 if guards else None,
        )
        return state, {"loss": loss, "grad_norm": gnorm, "ok": ok}

    return step


def make_n2n_train_step(
    apply_fn: Callable,
    noise_fn: Optional[Callable] = None,
    increase_ratio: float = 2.0,
    n_epoch: int = 100,
    subsampler: str = "xla",
    lambda1: float = 1.0,
    lambda2: float = 1.0,
):
    """Neighbor2Neighbor self-supervised step (training_script.md:126-156).

    One fused device program per step: [synthetic noise] → mask-pair draw →
    two sub-image gathers → f(sub1) + no-grad f(noisy) → regularized loss →
    backward → Adam. ``noise_fn(key, clean01) -> noisy01`` is optional — when
    None the step consumes real noisy frames (SEM pairs).

    ``subsampler``: 'xla' (counter-keyed jax.random + gather, reproducible
    across backends) or 'pallas' (fused on-core PRNG kernel, TPU only —
    different random stream, identical distribution).
    """

    def loss_fn(params, noisy01, sel1, sel2, lam):
        sub1 = generate_subimages(noisy01, sel1)
        sub2 = generate_subimages(noisy01, sel2)
        denoised = jax.lax.stop_gradient(apply_fn({"params": params}, noisy01))
        den_sub1 = generate_subimages(denoised, sel1)
        den_sub2 = generate_subimages(denoised, sel2)
        pred = apply_fn({"params": params}, sub1)
        total, (l_rec, l_reg) = n2n_regularized_loss(
            pred, sub2, den_sub1, den_sub2, lam, lambda1=lambda1, lambda2=lambda2
        )
        return total, (l_rec, l_reg)

    @partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, clean255, noisy255, key, epoch):
        clean01 = clean255.astype(jnp.float32) / 255.0
        if noise_fn is not None:
            knoise, kmask = jax.random.split(key)
            noisy01 = noise_fn(knoise, clean01)
        else:
            kmask = key
            noisy01 = noisy255.astype(jnp.float32) / 255.0
        lam = epoch.astype(jnp.float32) / n_epoch * increase_ratio
        if subsampler == "pallas":
            from ..ops.neighbor_pallas import subsample_pair_pallas

            seed = jax.random.randint(kmask, (), 0, 2**31 - 1)
            _, _, (sel1, sel2) = subsample_pair_pallas(seed, noisy01)
        else:
            sel1, sel2 = generate_mask_pair(kmask, noisy01.shape)
        (loss, (l_rec, l_reg)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, noisy01, sel1, sel2, lam
        )
        state = state.apply_gradients(grads)
        return state, {"loss": loss, "loss_rec": l_rec, "loss_reg": l_reg}

    return step
