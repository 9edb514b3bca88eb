"""On-device eval metrics (PSNR + MATLAB-SSIM) for the burst pipeline.

The reference computes per-frame metrics on the host after fetching every
prediction (``evaluation_704.py:187-197``). On a 1-core host behind a slow
transport that pass dominates full-CLI wall time (docs/PERF.md §9: ~85 %).
This module is the single source of the on-device metric semantics: the
batched ``make_device_metrics`` program scores a whole burst of predictions
against their clean frames on the TPU (predictions stay device-resident —
with ``--save_images none`` the only thing fetched per frame is scalars),
and ``frame_psnr_ssim`` scores one frame inside a caller's own jitted
program (the whole-image eval CLI fuses it after its forward+quantize).

Accuracy contract: PSNR matches the host float32 path (same accumulation
dtype; identical frames → +inf like ``calculate_psnr(zero_mse_psnr=None)``);
SSIM runs the float32 ``ssim_jax`` variant, ~1e-6 from the host float64
MATLAB-SSIM — the CLIs keep host metrics as the default and expose this
behind ``--device_metrics``.
"""
from __future__ import annotations

__all__ = ["frame_psnr_ssim", "make_device_metrics"]


def frame_psnr_ssim(pred255, clean255):
    """Score ONE frame on device: [H,W] or [H,W,C] in [0,255] → (psnr, ssim).

    PSNR is the un-guarded ``utils_eval.py:49-53`` variant; SSIM is the
    MATLAB-equivalent ``ssim_jax`` (11×11 Gaussian σ=1.5, REFLECT_101
    borders, [5:-5] valid crop), scored per channel and averaged exactly
    like ``calculate_ssim``'s dispatch. Trace-time only (call inside jit).
    """
    import jax.numpy as jnp

    from .ssim import ssim_jax

    p = pred255.astype(jnp.float32)
    c = clean255.astype(jnp.float32)
    mse = jnp.mean(jnp.square(p - c))
    psnr = 10.0 * jnp.log10(255.0 * 255.0 / mse)
    pb = p[None] if p.ndim == 2 else jnp.moveaxis(p, -1, 0)
    cb = c[None] if c.ndim == 2 else jnp.moveaxis(c, -1, 0)
    return psnr, ssim_jax(pb, cb).mean()


def make_device_metrics():
    """Build a jitted ``(pred_u8[F,H,W], clean_u8[F,H,W]) -> (psnr[F], ssim[F])``."""
    import jax

    return jax.jit(jax.vmap(frame_psnr_ssim))
