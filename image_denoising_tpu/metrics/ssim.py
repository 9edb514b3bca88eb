"""MATLAB-equivalent SSIM.

Reference semantics (``utils_eval.py:19-47``): 11×11 Gaussian window σ=1.5
(cv2.getGaussianKernel outer product), correlation with REFLECT_101 borders
(cv2.filter2D default), a [5:-5, 5:-5] valid crop, C1=(0.01·255)²,
C2=(0.03·255)², float64 accumulation. 3-channel images are scored per channel
and averaged; single-channel HxWx1 is squeezed.

This implementation is host-side NumPy/SciPy (``scipy.ndimage.correlate`` with
``mode='mirror'`` == REFLECT_101) so it has no OpenCV dependency; tests verify
bit-level agreement against a cv2 oracle when cv2 is available.

A batched on-device variant (``ssim_jax``) is provided for fast validation
loops: it uses an XLA depthwise convolution with explicit mirror padding and
matches the host version to ~1e-6 (float32 accumulation on device).
"""
from __future__ import annotations

import numpy as np

__all__ = ["gaussian_window", "ssim", "calculate_ssim", "ssim_jax"]

_C1 = (0.01 * 255) ** 2
_C2 = (0.03 * 255) ** 2


def gaussian_window(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Separable Gaussian kernel identical to cv2.getGaussianKernel outer prod."""
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(ax**2) / (2.0 * sigma**2))
    k /= k.sum()
    return np.outer(k, k)


def _filter_mirror(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    from scipy.ndimage import correlate

    return correlate(img, window, mode="mirror")


import threading

_NATIVE = None
_NATIVE_FAILED = False
_NATIVE_LOCK = threading.Lock()


def _native_lib():
    """Native separable-filter SSIM (native/ssim.cpp) — ~10× the scipy path.

    Thread-safe: the --host_workers CLI pool may race several first calls;
    the lock keeps two threads from both spawning the make subprocess.
    ssim_gray itself is reentrant (no shared mutable state) and releases
    the GIL for the duration of the ctypes call.
    """
    if _NATIVE is not None or _NATIVE_FAILED:
        return _NATIVE
    with _NATIVE_LOCK:
        return _native_lib_locked()


def _native_lib_locked():
    global _NATIVE, _NATIVE_FAILED
    if _NATIVE is not None or _NATIVE_FAILED:
        return _NATIVE
    import ctypes
    import os
    import subprocess

    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )
    so = os.path.join(native_dir, "libssim.so")
    # Always run make (a no-op when up to date): the Makefile's ssim.cpp
    # prerequisite rebuilds a stale .so left by an older source — required
    # for fixes like the thread-safe kernel init to actually take effect
    # on hosts that built before the change.
    try:
        subprocess.run(["make", "-C", native_dir, "libssim.so"], check=True,
                       capture_output=True)
    except Exception:
        if not os.path.exists(so):  # no make, no prebuilt library
            _NATIVE_FAILED = True
            return None
    if not os.path.exists(so):
        _NATIVE_FAILED = True
        return None
    lib = ctypes.CDLL(so)
    lib.ssim_gray.restype = ctypes.c_double
    lib.ssim_gray.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int, ctypes.c_int,
    ]
    _NATIVE = lib
    return lib


def ssim(prediction, target, native: bool = True) -> float:
    """Single-channel SSIM on [0,255]-domain 2D arrays (float64)."""
    img1 = np.asarray(prediction, dtype=np.float64)
    img2 = np.asarray(target, dtype=np.float64)
    if native and img1.ndim == 2 and min(img1.shape) >= 11:
        lib = _native_lib()
        if lib is not None:
            import ctypes

            a = np.ascontiguousarray(img1)
            b = np.ascontiguousarray(img2)
            return float(lib.ssim_gray(
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                a.shape[0], a.shape[1],
            ))
    window = gaussian_window()
    mu1 = _filter_mirror(img1, window)[5:-5, 5:-5]
    mu2 = _filter_mirror(img2, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filter_mirror(img1**2, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = _filter_mirror(img2**2, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = _filter_mirror(img1 * img2, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    return float(ssim_map.mean())


def calculate_ssim(target, ref) -> float:
    """Dispatch on ndim/channels exactly like the reference wrapper."""
    img1 = np.asarray(target, dtype=np.float64)
    img2 = np.asarray(ref, dtype=np.float64)
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return ssim(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            return float(np.mean([ssim(img1[:, :, i], img2[:, :, i]) for i in range(3)]))
        if img1.shape[2] == 1:
            return ssim(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")


# ---------------------------------------------------------------------------
# On-device batched SSIM (for fast validation; float32)
# ---------------------------------------------------------------------------


def ssim_jax(pred, target):
    """Batched SSIM on device. pred/target: [B,H,W] float32 in [0,255].

    Mirror (REFLECT_101) padding + depthwise correlation + [5:-5] valid crop.
    Returns [B] per-image SSIM. ~1e-6 from the float64 host version.

    Performance shape (v5e measurement, scripts/tpu_device_metrics_timing.py):
    C=1 convs cannot map to the MXU, so the filter runs on the VPU — the
    original 2-D 11×11 form cost 0.12 s/frame at 704². Two changes keep the
    numerics regime (f32 HIGHEST; see below) while cutting the work:
    * the Gaussian window is rank-1, so filter separably — 11+11 taps
      instead of 121 (5.5× fewer MACs);
    * the five filtered streams (x, y, x², y², xy) run as ONE batched conv
      pair instead of five dispatches.

    HIGHEST precision is required: TPU f32 convs default to bf16 MXU passes,
    which lose ~3 digits through the sigma = E[x²]−µ² cancellation (measured
    6.7e-4 SSIM error on v5e vs host f64 — run_tpu_checks
    check_device_metrics pins ≤1e-4).
    """
    import jax.numpy as jnp
    from jax import lax

    ax = np.arange(11, dtype=np.float64) - 5.0
    g1d = np.exp(-(ax**2) / (2.0 * 1.5**2))
    g1d /= g1d.sum()  # the same 1-D kernel whose outer product is the window
    g = jnp.asarray(g1d, dtype=jnp.float32)
    pad = 5

    def filt(x):  # x: [S,H,W] — separable 11×1 then 1×11, both HIGHEST
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
        xp = xp[..., None]  # NHWC, C=1
        y = lax.conv_general_dilated(
            xp, g.reshape(11, 1, 1, 1), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        y = lax.conv_general_dilated(
            y, g.reshape(1, 11, 1, 1), window_strides=(1, 1),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        return y[..., 0][:, 5:-5, 5:-5]

    img1 = pred.astype(jnp.float32)
    img2 = target.astype(jnp.float32)
    b = img1.shape[0]
    # one batched filter pass over the five streams
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    f = filt(stacked)
    mu1, mu2, e11, e22, e12 = (f[i * b : (i + 1) * b] for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )
    return ssim_map.mean(axis=(1, 2))
