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

__all__ = ["frame_psnr_ssim", "frame_iq_iou", "make_device_metrics"]


def _psnr(p, c):
    """Un-guarded ``utils_eval.py:49-53`` PSNR on f32 frames in [0,255].

    The single source of the device-PSNR accuracy contract (identical
    frames → +inf) — both the PSNR+SSIM scorer and the psnr-only scorer
    call this, so E3/E5 and E6 can never silently diverge.
    """
    import jax.numpy as jnp

    mse = jnp.mean(jnp.square(p - c))
    return 10.0 * jnp.log10(255.0 * 255.0 / mse)


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
    psnr = _psnr(p, c)
    pb = p[None] if p.ndim == 2 else jnp.moveaxis(p, -1, 0)
    cb = c[None] if c.ndim == 2 else jnp.moveaxis(c, -1, 0)
    return psnr, ssim_jax(pb, cb).mean()


def frame_iq_iou(pred255, clean255, low_q: float = 0.25, high_q: float = 0.75):
    """Score the 3-class intensity-quantized IoU for ONE frame on device.

    Mirrors ``metrics.iq_iou.compute_iq_iou`` (reference
    ``evaluation_704_iqsl.py:38-83``): thresholds are the (low_q, high_q)
    quantiles of the *ground-truth* gray frame; both frames quantize into
    {dark, mid, bright}; per-class IoU, NaN when a class is empty in both.
    Returns a ``[3]`` float32 vector. Trace-time only (call inside jit).

    Matches the host path exactly except when a float32 quantile rounds
    across a pixel value the float64 host quantile does not — pixels take
    only 256 distinct gray levels, so this needs the interpolated threshold
    to land within half an ulp of a level (not observed in tests).
    """
    import jax.numpy as jnp

    gt = clean255.astype(jnp.float32)
    pr = pred255.astype(jnp.float32)
    if gt.ndim == 3:
        gt, pr = gt.mean(axis=-1), pr.mean(axis=-1)
    gt, pr = gt / 255.0, pr / 255.0
    t1, t2 = jnp.quantile(gt, low_q), jnp.quantile(gt, high_q)

    def labels(g):
        # host assignment order: dark, then mid, then bright — the bright
        # write wins on overlap (g >= t2), so test it first here
        return jnp.where(g >= t2, 2, jnp.where(g <= t1, 0, 1))

    gl, pl = labels(gt), labels(pr)
    ious = []
    for k in range(3):
        gk, pk = gl == k, pl == k
        inter = jnp.sum(gk & pk).astype(jnp.float32)
        union = jnp.sum(gk | pk).astype(jnp.float32)
        ious.append(jnp.where(union == 0, jnp.nan, inter / jnp.maximum(union, 1.0)))
    return jnp.stack(ious)


import functools


@functools.lru_cache(maxsize=None)
def make_device_metrics(iq_iou: bool = False, low_q: float = 0.25,
                        high_q: float = 0.75, ssim: bool = True):
    """Build a jitted burst scorer: ``(pred_u8[F,H,W], clean_u8[F,H,W]) ->
    (psnr[F], ssim[F])``, plus ``ious[F,3]`` when ``iq_iou`` is set.

    Memoized on the config: jax.jit caches compiled programs per CALLABLE
    identity, so returning a fresh closure per call meant every evaluate()
    in a process recompiled the scorer — minutes per rep on a remote-compile
    backend (measured: the device-metrics CLI bench paid ~2 min/rep).

    ``ssim=False`` drops the SSIM output AND its 11×11 filtering work from
    the compiled program — for CLIs that only report PSNR (+IoU), e.g. the
    memory eval (E6), where compiling an unused gaussian-window pass costs
    real minutes on a remote-compile backend. The tuple is then
    ``(psnr,)`` or ``(psnr, ious)``.
    """
    import jax
    import jax.numpy as jnp

    def score_one(p, c):
        out = []
        if ssim:
            out.extend(frame_psnr_ssim(p, c))
        else:
            out.append(_psnr(p.astype(jnp.float32), c.astype(jnp.float32)))
        if iq_iou:
            out.append(frame_iq_iou(p, c, low_q, high_q))
        return tuple(out)

    return jax.jit(jax.vmap(score_one))
