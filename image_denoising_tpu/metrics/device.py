"""On-device batched eval metrics (PSNR + MATLAB-SSIM) for the burst pipeline.

The reference computes per-frame metrics on the host after fetching every
prediction (``evaluation_704.py:187-197``). On a 1-core host behind a slow
transport that pass dominates full-CLI wall time (docs/PERF.md §9: ~85 %).
This module compiles ONE jitted program per frame shape that scores a whole
burst of predictions against their clean frames on the TPU — predictions stay
device-resident (no D2H round trip), and with ``--save_images none`` the only
thing fetched per frame is three scalars.

Accuracy contract: PSNR matches the host float32 path (same accumulation
dtype); SSIM runs the float32 ``ssim_jax`` variant, ~1e-6 from the host
float64 MATLAB-SSIM — the CLI keeps host metrics as the default and exposes
this behind ``--device_metrics``.
"""
from __future__ import annotations

__all__ = ["make_device_metrics"]


def make_device_metrics():
    """Build a jitted ``(pred_u8[F,H,W], clean_u8[F,H,W]) -> (psnr[F], ssim[F])``.

    PSNR is the un-guarded ``utils_eval.py:49-53`` variant (identical frames
    give +inf, like ``calculate_psnr(..., zero_mse_psnr=None)``); SSIM is the
    MATLAB-equivalent ``ssim_jax`` (11×11 Gaussian σ=1.5, REFLECT_101 borders,
    [5:-5] valid crop) in float32.
    """
    import jax
    import jax.numpy as jnp

    from .ssim import ssim_jax

    @jax.jit
    def metrics_fn(pred_u8, clean_u8):
        p = pred_u8.astype(jnp.float32)
        c = clean_u8.astype(jnp.float32)
        mse = jnp.mean(jnp.square(p - c), axis=(1, 2))
        psnr = 10.0 * jnp.log10(255.0 * 255.0 / mse)
        return psnr, ssim_jax(p, c)

    return metrics_fn
