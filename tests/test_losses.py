import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_denoising_tpu.losses import (
    gradient_loss,
    iqsl_loss,
    l1fft_loss,
    l1_loss,
    n2n_regularized_loss,
    structure_loss,
)

torch = pytest.importorskip("torch")


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


@pytest.fixture
def triplet(rng):
    pred = rng.random((2, 1, 24, 24), dtype=np.float32)
    pred2 = rng.random((2, 1, 24, 24), dtype=np.float32)
    target = rng.random((2, 1, 24, 24), dtype=np.float32)
    return pred, pred2, target


def test_structure_loss_matches_torch(triplet):
    import torch.nn.functional as F

    pred, pred2, target = triplet
    tp, tp2, tt = map(torch.from_numpy, triplet)
    pixel = F.l1_loss(tp, tt)
    tv1 = F.l1_loss(tp2[:, :, 1:, :], tp2[:, :, :-1, :])
    tv2 = F.l1_loss(tp2[:, :, :, 1:], tp2[:, :, :, :-1])
    cst = F.l1_loss(tp2, tt)
    oracle = 1.0 * pixel + 0.5 * (tv1 + tv2) / 2 + 0.5 * cst

    ours = structure_loss(_nhwc(pred), _nhwc(pred2), _nhwc(target))
    assert abs(float(ours) - float(oracle)) < 1e-6


def test_l1fft_matches_torch(triplet):
    import torch.nn.functional as F

    pred, _, target = triplet
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    oracle = F.l1_loss(tp, tt) + torch.abs(
        torch.fft.fft2(tp) - torch.fft.fft2(tt)
    ).mean()
    ours = l1fft_loss(_nhwc(pred), _nhwc(target))
    assert abs(float(ours) - float(oracle)) < 1e-4


def test_gradient_loss_matches_torch(triplet):
    import torch.nn.functional as F

    pred, _, target = triplet
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)

    def g(x):
        return x[:, :, :, 1:] - x[:, :, :, :-1], x[:, :, 1:, :] - x[:, :, :-1, :]

    pdx, pdy = g(tp)
    tdx, tdy = g(tt)
    oracle = F.l1_loss(pdx, tdx) + F.l1_loss(pdy, tdy)
    ours = gradient_loss(_nhwc(pred), _nhwc(target))
    assert abs(float(ours) - float(oracle)) < 1e-6


@pytest.mark.parametrize("margin", [0.0, 0.05])
def test_iqsl_matches_reference_impl(triplet, margin):
    """Oracle: an independent float64 numpy transcription of the math in
    finetune_iqsl.py:291-383 (not the torch code itself)."""
    pred, _, target = triplet
    t1, t2, tau, ce_factor, eps = 0.3, 0.7, 0.1, 0.5, 1e-6

    y = target[:, 0].astype(np.float64)
    y_hat = pred[:, 0].astype(np.float64)
    if margin > 0:
        valid = (
            (y <= t1 - margin)
            | ((y >= t1 + margin) & (y <= t2 - margin))
            | (y >= t2 + margin)
        ).astype(np.float64)
    else:
        valid = np.ones_like(y)
    oh = np.stack(
        [(y <= t1), ((y > t1) & (y < t2)), (y >= t2)], axis=-1
    ).astype(np.float64)
    centers = np.array([t1 / 2, (t1 + t2) / 2, (t2 + 1) / 2])
    dist = np.abs(y_hat[..., None] - centers)
    logits = -dist / tau
    e = np.exp(logits - logits.max(-1, keepdims=True))
    prob = e / e.sum(-1, keepdims=True)
    prob = prob * valid[..., None]
    oh = oh * valid[..., None]
    inter = (prob * oh).sum((0, 1, 2))
    dice = (2 * inter + eps) / (prob.sum((0, 1, 2)) + oh.sum((0, 1, 2)) + eps)
    loss_dice = 1 - dice.mean()
    ce = -(oh * np.log(prob + eps)).sum() / (valid[..., None].sum() * 3 + eps)
    oracle = loss_dice + ce_factor * ce

    ours = iqsl_loss(_nhwc(pred), _nhwc(target), t1, t2, tau=tau,
                     margin=margin, ce_factor=ce_factor)
    assert abs(float(ours) - float(oracle)) < 1e-5


def test_n2n_regularized_loss_values(rng):
    a = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    b = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    c = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    d = jnp.asarray(rng.random((2, 8, 8, 1), dtype=np.float32))
    lam = 1.5
    total, (l1v, l2v) = n2n_regularized_loss(a, b, c, d, lam)
    diff = np.asarray(a) - np.asarray(b)
    exp_diff = np.asarray(c) - np.asarray(d)
    assert abs(float(l1v) - np.mean(diff**2)) < 1e-6
    assert abs(float(l2v) - lam * np.mean((diff - exp_diff) ** 2)) < 1e-6
    assert abs(float(total) - (float(l1v) + float(l2v))) < 1e-6


def test_n2n_loss2_stops_gradient():
    # gradient must flow only through the prediction, not the denoised pair
    def f(x):
        total, _ = n2n_regularized_loss(x, x * 0 + 0.5, x * 2, x * 3, 1.0)
        return total

    g = jax.grad(f)(jnp.ones((1, 4, 4, 1)) * 0.2)
    # If stop_gradient were missing, the x*2/x*3 terms would contribute.
    def f_pred_only(x):
        total, _ = n2n_regularized_loss(
            x, jnp.full((1, 4, 4, 1), 0.5),
            jax.lax.stop_gradient(x * 2), jax.lax.stop_gradient(x * 3), 1.0
        )
        return total

    g2 = jax.grad(f_pred_only)(jnp.ones((1, 4, 4, 1)) * 0.2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-6)


def test_n2n_lambda_weights(rng):
    a = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    c = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    d = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    total, (l1v, l2v) = n2n_regularized_loss(a, b, c, d, 1.5,
                                             lambda1=0.3, lambda2=2.0)
    assert abs(float(total) - (0.3 * float(l1v) + 2.0 * float(l2v))) < 1e-6
