import numpy as np
import pytest

from image_denoising_tpu.metrics import (
    calculate_psnr,
    calculate_ssim,
    compute_iq_iou,
    ssim,
)
from image_denoising_tpu.metrics.ssim import gaussian_window, ssim_jax

cv2 = pytest.importorskip("cv2", reason="cv2 oracle not available")


def _pair(rng, shape=(96, 128)):
    clean = rng.integers(0, 256, size=shape).astype(np.uint8)
    noisy = np.clip(
        clean.astype(np.float32) + rng.normal(0, 12, size=shape), 0, 255
    ).astype(np.uint8)
    return clean, noisy


def test_gaussian_window_matches_cv2():
    k = cv2.getGaussianKernel(11, 1.5)
    oracle = np.outer(k, k.T)
    np.testing.assert_allclose(gaussian_window(), oracle, atol=1e-15)


def _cv2_ssim(img1, img2):
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    k = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(k, k.T)
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    s1 = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1**2
    s2 = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2**2
    s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1 * mu2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s1 + s2 + C2)
    )
    return m.mean()


def test_ssim_matches_cv2_oracle(rng):
    clean, noisy = _pair(rng)
    ours = ssim(noisy, clean)
    oracle = _cv2_ssim(noisy, clean)
    assert abs(ours - oracle) < 1e-10


def test_ssim_3channel_dispatch(rng):
    clean, noisy = _pair(rng, shape=(64, 64, 3))
    ours = calculate_ssim(noisy, clean)
    oracle = np.mean([_cv2_ssim(noisy[..., i], clean[..., i]) for i in range(3)])
    assert abs(ours - oracle) < 1e-10


def test_ssim_1channel_squeeze(rng):
    clean, noisy = _pair(rng, shape=(64, 64))
    a = calculate_ssim(noisy[..., None], clean[..., None])
    b = calculate_ssim(noisy, clean)
    assert a == b


def test_ssim_shape_mismatch_raises(rng):
    with pytest.raises(ValueError):
        calculate_ssim(np.zeros((8, 8)), np.zeros((9, 8)))


def test_ssim_jax_close_to_host(rng):
    clean, noisy = _pair(rng, shape=(72, 80))
    ours = float(
        ssim_jax(noisy[None].astype(np.float32), clean[None].astype(np.float32))[0]
    )
    host = ssim(noisy, clean)
    assert abs(ours - host) < 1e-4


def test_psnr_float32_semantics(rng):
    clean, noisy = _pair(rng)
    img1 = noisy.astype(np.float32)
    img2 = clean.astype(np.float32)
    oracle = 10.0 * np.log10(255.0**2 / np.mean((img1 - img2) ** 2))
    assert abs(calculate_psnr(noisy, clean) - oracle) < 1e-6


def test_psnr_zero_mse_guard():
    x = np.full((16, 16), 100, np.uint8)
    assert calculate_psnr(x, x) == 99.0
    assert calculate_psnr(x, x, zero_mse_psnr=None) == float("inf")


def test_iq_iou_identity(rng):
    clean, _ = _pair(rng)
    ious = compute_iq_iou(clean, clean)
    assert all(abs(v - 1.0) < 1e-12 for v in ious)


def test_iq_iou_quantile_thresholds(rng):
    clean, noisy = _pair(rng)
    ious = compute_iq_iou(noisy, clean, low_q=0.25, high_q=0.75)
    assert len(ious) == 3
    assert all(0.0 <= v <= 1.0 for v in ious)
    # mid class exists and with 25/75 quantiles covers ~half the GT pixels
    from image_denoising_tpu.metrics import quantize_3class, to_gray_float01

    g = to_gray_float01(clean)
    t1, t2 = np.quantile(g, [0.25, 0.75])
    lbl = quantize_3class(g, t1, t2)
    frac_mid = (lbl == 1).mean()
    assert 0.3 < frac_mid < 0.7


def test_native_ssim_matches_python(rng):
    from image_denoising_tpu.metrics.ssim import _native_lib, ssim

    if _native_lib() is None:
        pytest.skip("native ssim unavailable")
    clean, noisy = _pair(rng, shape=(96, 128))
    assert abs(ssim(noisy, clean, native=True) - ssim(noisy, clean, native=False)) < 1e-12
    # and against the cv2 oracle
    assert abs(ssim(noisy, clean, native=True) - _cv2_ssim(noisy, clean)) < 1e-10


def test_device_metrics_batched(rng):
    """make_device_metrics scores a [F,H,W] uint8 batch on device and matches
    the host per-frame metrics (PSNR f32-exact, SSIM ~f32-vs-f64)."""
    from image_denoising_tpu.metrics import (calculate_psnr, calculate_ssim,
                                             make_device_metrics)

    frames = [_pair(rng, shape=(72, 80)) for _ in range(3)]
    pred = np.stack([n for _, n in frames]).astype(np.uint8)
    clean = np.stack([c for c, _ in frames]).astype(np.uint8)
    psnr_d, ssim_d = make_device_metrics()(pred, clean)
    psnr_d, ssim_d = np.asarray(psnr_d), np.asarray(ssim_d)
    for k in range(3):
        assert abs(psnr_d[k] - calculate_psnr(pred[k], clean[k],
                                              zero_mse_psnr=None)) < 1e-3
        assert abs(ssim_d[k] - calculate_ssim(pred[k], clean[k])) < 1e-4
    # identical frames -> +inf, matching the un-guarded host variant
    psnr_i, _ = make_device_metrics()(clean, clean)
    assert np.all(np.isinf(np.asarray(psnr_i)))


def test_device_iq_iou_matches_host(rng):
    """frame_iq_iou mirrors compute_iq_iou (GT-quantile thresholds, 3-class
    IoU, NaN-on-empty-union) on device; make_device_metrics(iq_iou=True)
    returns it as the third output."""
    from image_denoising_tpu.metrics import make_device_metrics

    frames = [_pair(rng, shape=(72, 80)) for _ in range(3)]
    pred = np.stack([n for _, n in frames]).astype(np.uint8)
    clean = np.stack([c for c, _ in frames]).astype(np.uint8)
    fn = make_device_metrics(iq_iou=True, low_q=0.2, high_q=0.8)
    psnr_d, ssim_d, ious_d = (np.asarray(x) for x in fn(pred, clean))
    assert ious_d.shape == (3, 3)
    for k in range(3):
        host = compute_iq_iou(pred[k], clean[k], 0.2, 0.8)
        np.testing.assert_allclose(ious_d[k], host, atol=1e-7)
        assert abs(psnr_d[k] - calculate_psnr(pred[k], clean[k],
                                              zero_mse_psnr=None)) < 1e-3

    # constant frames: t1 == t2 -> everything lands in 'bright' (the host's
    # last assignment wins); dark/mid unions are empty -> NaN, bright IoU 1
    const = np.full((2, 16, 16), 77, np.uint8)
    _, _, ious_c = fn(const, const)
    ious_c = np.asarray(ious_c)
    host_c = compute_iq_iou(const[0], const[0])
    assert np.isnan(ious_c[0, 0]) and np.isnan(host_c[0])
    assert np.isnan(ious_c[0, 1]) and np.isnan(host_c[1])
    assert ious_c[0, 2] == 1.0 and host_c[2] == 1.0


def test_device_metrics_psnr_only(rng):
    """ssim=False drops SSIM from the scorer (E6's PSNR+IoU mode): the tuple
    is (psnr,) or (psnr, ious) and PSNR still matches the host path."""
    from image_denoising_tpu.metrics import (calculate_psnr,
                                             make_device_metrics)

    frames = [_pair(rng, shape=(72, 80)) for _ in range(2)]
    pred = np.stack([n for _, n in frames]).astype(np.uint8)
    clean = np.stack([c for c, _ in frames]).astype(np.uint8)

    out = make_device_metrics(ssim=False)(pred, clean)
    assert len(out) == 1
    psnr_d = np.asarray(out[0])
    for k in range(2):
        assert abs(psnr_d[k] - calculate_psnr(pred[k], clean[k],
                                              zero_mse_psnr=None)) < 1e-3

    out = make_device_metrics(ssim=False, iq_iou=True)(pred, clean)
    assert len(out) == 2
    np.testing.assert_allclose(np.asarray(out[0]), psnr_d, atol=1e-5)
    ious_d = np.asarray(out[1])
    assert ious_d.shape == (2, 3)
    for k in range(2):
        np.testing.assert_allclose(
            ious_d[k], compute_iq_iou(pred[k], clean[k]), atol=1e-7)
