"""N2N convergence demonstration on real TPU (VERDICT r3 item 7).

The reference documents Neighbor2Neighbor training (training_script.md:
126-156) but its code path is dormant (the N2N loss exists, the trainer
never dispatches it). Ours activates it via ``cli/train.py --loss n2n``;
this script demonstrates the path *learns*, not just steps: train the
blind UNet on clean fixtures + synthetic gauss25 noise, snapshot every few
epochs, evaluate each snapshot on a held-out noisy set, and report the PSNR
trajectory vs the noisy-input PSNR.

Usage: python scripts/tpu_n2n_convergence.py [subsampler] [epochs] [hw]
  subsampler: xla (default) | pallas (TPU-only fused PRNG kernel)
  epochs: default 60 (16 imgs / batch 4 = 4 steps/epoch)
  hw: frame size, default 128 (divisible by 32 for the UNet)

Prints one JSON line: noisy-input PSNR, per-snapshot PSNRs, pass flag
(monotone-ish improvement AND final > noisy + 1 dB).
"""
from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(root: str, n: int, hw: int, sigma: float = 25.0):
    """Clean structured frames; noisy = clean + N(0, sigma) (gauss25 —
    the same distribution the n2n trainer re-draws per step)."""
    from PIL import Image

    os.makedirs(os.path.join(root, "clean"), exist_ok=True)
    os.makedirs(os.path.join(root, "noise"), exist_ok=True)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:hw, 0:hw]
    for i in range(n):
        f1, f2 = 5 + (i % 5) * 2, 9 + (i % 3) * 4
        clean = (
            120
            + 55 * np.sin(xx / f1 + i)
            + 45 * np.cos(yy / f2 - 0.5 * i)
            + 25 * (((yy + 8 * i) // 20 + xx // 20) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, sigma, clean.shape),
            0, 255,
        ).astype(np.uint8)
        Image.fromarray(clean).save(f"{root}/clean/n2n_{i:02d}.png")
        Image.fromarray(noisy).save(f"{root}/noise/n2n_{i:02d}.png")


def main():
    subsampler = sys.argv[1] if len(sys.argv) > 1 else "xla"
    n_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    hw = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    root = f"/tmp/n2n_conv_data_{hw}"
    make_dataset(root, n=16, hw=hw)

    from image_denoising_tpu.cli import evaluation as eval_cli
    from image_denoising_tpu.cli import train as train_cli
    from image_denoising_tpu.metrics import calculate_psnr

    # noisy-input baseline PSNR over the set
    from PIL import Image

    noisy_psnrs = []
    for cp in sorted(glob.glob(f"{root}/clean/*.png")):
        npth = cp.replace("/clean/", "/noise/")
        c = np.asarray(Image.open(cp), np.uint8)
        n = np.asarray(Image.open(npth), np.uint8)
        noisy_psnrs.append(calculate_psnr(n, c, zero_mse_psnr=None))
    noisy_psnr = float(np.mean(noisy_psnrs))

    snap = max(n_epoch // 4, 1)
    save_root = f"/tmp/n2n_conv_results_{subsampler}"
    train_cli.main([
        "--data_dir", root,
        "--save_model_path", save_root,
        "--log_name", "UNET_n2n_convergence",
        "--loss", "n2n",
        "--noisetype", "gauss25",
        "--subsampler", subsampler,
        "--n_feature", "16",
        "--n_epoch", str(n_epoch),
        "--batchsize", "4",
        "--n_snapshot", str(snap),
    ])

    ckpts = sorted(glob.glob(
        os.path.join(save_root, "**", "epoch_model_*.ckpt"), recursive=True,
    ))
    traj = {}
    for ck in ckpts:
        epoch = int(os.path.basename(ck).split("_")[-1].split(".")[0])
        if epoch == 0 or epoch % snap:
            continue
        avg = eval_cli.main([
            "--data_dir", root,
            "--checkpoint", ck,
            "--save_dir", f"/tmp/n2n_conv_eval_{subsampler}_{epoch}",
            "--n_feature", "16",
            "--log_name", "UNET_n2n_convergence",
            "--save_images", "none",
        ])
        traj[epoch] = round(avg["psnr"], 3)

    epochs = sorted(traj)
    final = traj[epochs[-1]]
    ok = bool(final > noisy_psnr + 1.0 and final >= traj[epochs[0]] - 0.2)
    print(json.dumps({
        "kind": "n2n_convergence", "subsampler": subsampler,
        "noisy_psnr": round(noisy_psnr, 3),
        "psnr_by_epoch": {str(e): traj[e] for e in epochs},
        "final_gain_db": round(final - noisy_psnr, 3),
        "pass": ok,
    }))


if __name__ == "__main__":
    main()
