"""Full-geometry metric parity on REAL hardware (VERDICT r3 item 3).

One torch checkpoint, two eval paths, production geometry:

* E2 — the reference's tiled-352 pyramid eval (evaluation_704.py:57-148:
  linear tent window, reflect edge padding, clip(p*255) with NO +0.5) driven
  on torch-CPU via the same loop transcription the CPU parity tests pin at
  96², here at the production 704²/tile-352/overlap-64 geometry — vs our
  `cli/evaluation_704.py` running compiled on the TPU, f32 and bf16.
* E6 — the reference's Hann-window memory eval: the ACTUAL reference module
  (`/root/reference/evaluation_704_iqsl_memory.py`: build_memory_bank,
  DenoiserWithMemoryAdapter [v5 HyperGatedResidualAdapter_FFT],
  denoise_full_image_patchwise, clip(p*255 + 0.5)) imported and driven on
  torch-CPU at patch 128 / overlap 64 — vs our
  `cli/evaluation_704_iqsl_memory.py` on the TPU. The parity bank uses
  memory_stride 64 (numerics are bank-size independent; the 105k stride-4
  bank's throughput is scripts/tpu_memory_production.py's job).

Acceptance (BASELINE.md): |ΔPSNR| ≤ 0.05 dB; SSIM within 1e-3. Both sides
are scored with OUR metric functions (bit-level-pinned vs cv2 elsewhere), so
the comparison isolates the *inference* paths.

Usage: python scripts/tpu_metric_parity.py [tiny]
  tiny: 96² frames / tile 64 / patch 64 on whatever backend is default —
  a fast plumbing smoke (run it on CPU before burning a TPU compile).

Prints one JSON line with every delta.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"


def make_dataset(root: str, n: int, hw: int) -> list:
    from PIL import Image

    os.makedirs(os.path.join(root, "clean"), exist_ok=True)
    os.makedirs(os.path.join(root, "noise"), exist_ok=True)
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:hw, 0:hw]
    frames = []
    for i in range(n):
        clean = (
            115
            + 65 * np.sin(xx / 9.0 + 2.1 * i)
            + 35 * ((yy // 24 + xx // 24) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 13, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(f"{root}/clean/sem_{i:02d}.png")
        Image.fromarray(noisy).save(f"{root}/noise/sem_{i:02d}.png")
        frames.append((clean, noisy))
    return frames


def reference_eval_704(net, frames, ps, overlap):
    """The reference evaluation_704.py per-frame loop (lines 57-148) on the
    torch net: tent window, reflect pad, clip(p*255) — NO +0.5 round."""
    import torch

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


def main():
    tiny = len(sys.argv) > 1 and sys.argv[1] == "tiny"
    if os.environ.get("IDT_CPU"):
        # the sitecustomize pins jax_platforms to axon,cpu; the env var
        # alone is ignored — flip it post-import for the CPU smoke
        import jax

        jax.config.update("jax_platforms", "cpu")
    hw, tile, t_ov, patch, n_frames = (
        (96, 64, 32, 64, 2) if tiny else (704, 352, 64, 128, 3)
    )
    n_feat = 16 if tiny else 48
    mem_stride = 32 if tiny else 64
    num_mem = 2

    import torch

    sys.path.insert(0, REFERENCE)
    import arch_unet
    import evaluation_704_iqsl_memory as ref_e6

    from image_denoising_tpu.metrics import calculate_psnr

    root = f"/tmp/parity{hw}_data"
    frames = make_dataset(root, n_frames, hw)

    torch.manual_seed(5)
    net = arch_unet.ImprovedUNet(in_nc=1, out_nc=1, n_feature=n_feat)
    net.eval()
    base_pth = f"/tmp/parity{hw}_model.pth"
    torch.save(net.state_dict(), base_pth)

    out = {"kind": "metric_parity", "geometry": f"{hw}2/tile{tile}/patch{patch}"}

    # ---------------- E2: tiled-352 pyramid ----------------
    ref_psnr, ref_ssim = reference_eval_704(net, frames, ps=tile, overlap=t_ov)
    out["e2_ref_psnr"] = round(ref_psnr, 4)
    out["e2_ref_ssim"] = round(ref_ssim, 6)

    from image_denoising_tpu.cli import evaluation_704 as e2_cli

    for dtype in ("float32", "bfloat16"):
        avg = e2_cli.main([
            "--data_dir", root,
            "--checkpoint", base_pth,
            "--save_dir", f"/tmp/parity{hw}_e2_{dtype}",
            "--n_feature", str(n_feat),
            "--log_name", "UNetImproved",
            "--tile", str(tile),
            "--overlap", str(t_ov),
            "--dtype", dtype,
            "--save_images", "none",
        ])
        key = "f32" if dtype == "float32" else "bf16"
        out[f"e2_{key}_psnr"] = round(avg["psnr"], 4)
        out[f"e2_{key}_dpsnr"] = round(abs(avg["psnr"] - ref_psnr), 4)
        out[f"e2_{key}_ssim"] = round(avg["ssim"], 6)
        out[f"e2_{key}_dssim"] = round(abs(avg["ssim"] - ref_ssim), 6)

    # ---------------- E6: Hann memory eval ----------------
    # reference side: the actual reference module end-to-end
    device = torch.device("cpu")
    clean_paths = sorted(
        os.path.join(root, "clean", f) for f in os.listdir(f"{root}/clean")
    )
    noise_paths = sorted(
        os.path.join(root, "noise", f) for f in os.listdir(f"{root}/noise")
    )
    mem_noise, mem_clean = ref_e6.build_memory_bank(
        clean_paths[:num_mem], noise_paths[:num_mem],
        patch_size=patch, stride=mem_stride, device=device,
    )
    wrapper = ref_e6.DenoiserWithMemoryAdapter(
        base_model=net, in_channels=1, hidden_channels=16,
        memory_noise_bank=mem_noise, memory_clean_bank=mem_clean,
    )
    # the v5 adapter zero-inits its last convs (identity at init) — randomize
    # ALL adapter params so the parity run exercises a non-trivial adapter
    gen = torch.Generator().manual_seed(9)
    with torch.no_grad():
        for p in wrapper.adapter.parameters():
            p.copy_(0.05 * torch.randn(p.shape, generator=gen))
    wrapper.eval()
    adapter_pth = f"/tmp/parity{hw}_adapter.pth"
    torch.save(wrapper.adapter.state_dict(), adapter_pth)

    ref6_psnrs = []
    with torch.no_grad():
        for clean, noisy in frames:
            pred = ref_e6.denoise_full_image_patchwise(
                wrapper, noisy.astype(np.float32), device,
                patch_size=patch, overlap=t_ov,
            )
            pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
            ref6_psnrs.append(
                calculate_psnr(pred255.squeeze(-1), clean, zero_mse_psnr=None)
            )
    ref6_psnr = float(np.mean(ref6_psnrs))
    out["e6_ref_psnr"] = round(ref6_psnr, 4)

    from image_denoising_tpu.cli import evaluation_704_iqsl_memory as e6_cli

    avg6 = e6_cli.main([
        "--data_dir", root,
        "--base_ckpt", base_pth,
        "--adapter_ckpt", adapter_pth,
        "--arch", "UNetImproved",
        "--save_dir", f"/tmp/parity{hw}_e6",
        "--n_feature", str(n_feat),
        "--patch_size", str(patch),
        "--overlap", str(t_ov),
        "--num_memory_images", str(num_mem),
        "--memory_stride", str(mem_stride),
        "--save_images", "none",
    ])
    out["e6_psnr"] = round(avg6["psnr"], 4)
    out["e6_dpsnr"] = round(abs(avg6["psnr"] - ref6_psnr), 4)

    out["pass"] = bool(
        out["e2_f32_dpsnr"] <= 0.05 and out["e2_f32_dssim"] <= 1e-3
        and out["e2_bf16_dpsnr"] <= 0.05
        and out["e6_dpsnr"] <= 0.05
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
