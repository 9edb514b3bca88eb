"""End-to-end PSNR/SSIM parity: the BASELINE.md acceptance criterion.

A torch reference model (random weights, saved as .pth) is evaluated through
(a) a transcription of the reference evaluation_704 loop running the actual
torch network, and (b) our CLI with the imported checkpoint. Average PSNR and
SSIM must agree within 0.05 dB / 1e-3 (in practice they agree to ~1e-3 dB —
the uint8 quantization absorbs the float jitter).
"""
import os
import sys

import numpy as np
import pytest

from conftest import requires_reference, REFERENCE_DIR

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    from PIL import Image

    sys.path.insert(0, REFERENCE_DIR)
    import arch_unet

    root = tmp_path_factory.mktemp("parity_e2e")
    data = root / "data"
    (data / "clean").mkdir(parents=True)
    (data / "noise").mkdir()
    rng = np.random.default_rng(17)
    frames = []
    for i in range(2):
        yy, xx = np.mgrid[0:96, 0:96]
        clean = (110 + 70 * np.sin(xx / 7.0 + i) + 20 * ((yy // 12) % 2)).clip(
            0, 255
        ).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 14, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(data / "clean" / f"f_{i}.png")
        Image.fromarray(noisy).save(data / "noise" / f"f_{i}.png")
        frames.append((clean, noisy))

    torch.manual_seed(5)
    net = arch_unet.ImprovedUNet(in_nc=1, out_nc=1, n_feature=16)
    net.eval()
    ckpt = str(root / "model.pth")
    torch.save(net.state_dict(), ckpt)
    sys.path.remove(REFERENCE_DIR)
    return str(data), ckpt, net, frames


def _reference_eval_704(net, frames, ps, overlap):
    """Transcription of the evaluation_704.py per-frame loop driving torch."""
    from image_denoising_tpu.metrics import calculate_psnr, calculate_ssim

    stride = ps - overlap
    yy, xx = np.meshgrid(np.linspace(0, 1, ps), np.linspace(0, 1, ps),
                         indexing="ij")
    wm_full = ((1 - np.abs(yy - 0.5) * 2) * (1 - np.abs(xx - 0.5) * 2)).astype(
        np.float32
    )
    psnrs, ssims = [], []
    for clean, noisy in frames:
        h, w = noisy.shape
        den = np.zeros((h, w), np.float32)
        contrib = np.zeros((h, w), np.float32)
        for r0 in range(0, h, stride):
            for c0 in range(0, w, stride):
                r1, c1 = min(r0 + ps, h), min(c0 + ps, w)
                patch = noisy[r0:r1, c0:c1].astype(np.float32) / 255.0
                padded = np.pad(
                    patch,
                    ((0, ps - patch.shape[0]), (0, ps - patch.shape[1])),
                    mode="reflect",
                )
                with torch.no_grad():
                    pred = net(torch.from_numpy(padded)[None, None])[0, 0].numpy()
                pred = np.clip(pred, 0, 1)[: patch.shape[0], : patch.shape[1]]
                wmc = wm_full[: patch.shape[0], : patch.shape[1]]
                den[r0:r1, c0:c1] += pred * wmc
                contrib[r0:r1, c0:c1] += wmc
        contrib[contrib == 0] = 1
        pred255 = np.clip(den / contrib * 255.0, 0, 255).astype(np.uint8)
        psnrs.append(calculate_psnr(pred255, clean, zero_mse_psnr=None))
        ssims.append(calculate_ssim(pred255, clean))
    return float(np.mean(psnrs)), float(np.mean(ssims))


@requires_reference
def test_tiled_eval_psnr_within_005db(fixture, tmp_path):
    data_dir, ckpt, net, frames = fixture
    ref_psnr, ref_ssim = _reference_eval_704(net, frames, ps=64, overlap=32)

    from image_denoising_tpu.cli import evaluation_704

    avg = evaluation_704.main([
        "--data_dir", data_dir,
        "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "eval"),
        "--n_feature", "16",
        "--log_name", "UNetImproved",
        "--tile", "64",
        "--overlap", "32",
    ])
    assert abs(avg["psnr"] - ref_psnr) < 0.05, (avg["psnr"], ref_psnr)
    assert abs(avg["ssim"] - ref_ssim) < 1e-3, (avg["ssim"], ref_ssim)


@requires_reference
def test_whole_frame_eval_psnr_within_005db(fixture, tmp_path):
    data_dir, ckpt, net, frames = fixture
    from image_denoising_tpu.metrics import calculate_psnr

    ref_psnrs = []
    for clean, noisy in frames:
        x = torch.from_numpy(noisy.astype(np.float32) / 255.0)[None, None]
        with torch.no_grad():
            pred = net(x)[0, 0].clamp(0, 1).numpy()
        pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
        ref_psnrs.append(calculate_psnr(pred255, clean, zero_mse_psnr=None))
    ref_psnr = float(np.mean(ref_psnrs))

    from image_denoising_tpu.cli import evaluation

    avg = evaluation.main([
        "--data_dir", data_dir,
        "--checkpoint", ckpt,
        "--save_dir", str(tmp_path / "eval_whole"),
        "--n_feature", "16",
        "--log_name", "UNetImproved",
    ])
    assert abs(avg["psnr"] - ref_psnr) < 0.05, (avg["psnr"], ref_psnr)
