"""Measure the PyTorch reference's CPU denoising throughput (the baseline).

Runs the unmodified reference code from /root/reference (read-only import, no
code copied) through its own tiled-352 eval loop semantics on a synthetic
704×704 frame, and records megapixels/sec into bench_baseline.json at the
repo root. bench.py compares our TPU throughput against this number
(BASELINE.json north star: ≥5× PyTorch-CPU on one chip).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def main():
    sys.path.insert(0, REFERENCE)
    import torch

    from arch_unet import ImprovedUNet

    torch.manual_seed(0)
    net = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48)
    net.eval()

    h = w = 704
    ps, overlap = 352, 64
    stride = ps - overlap
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, (h, w)).astype(np.uint8)

    def run_once():
        denoised = np.zeros((h, w), np.float32)
        contrib = np.zeros((h, w), np.float32)
        for r0 in range(0, h, stride):
            for c0 in range(0, w, stride):
                r1, c1 = min(r0 + ps, h), min(c0 + ps, w)
                patch = noisy[r0:r1, c0:c1].astype(np.float32) / 255.0
                ph, pw = patch.shape
                pad_h, pad_w = ps - ph, ps - pw
                if pad_h or pad_w:
                    # reference uses np.pad reflect; emulate with edge-safe reflect
                    patch = np.pad(
                        patch,
                        ((0, min(pad_h, ph - 1)), (0, min(pad_w, pw - 1))),
                        mode="reflect",
                    )
                    ph2, pw2 = patch.shape
                    if ph2 < ps or pw2 < ps:
                        patch = np.pad(
                            patch, ((0, ps - ph2), (0, ps - pw2)), mode="edge"
                        )
                x = torch.from_numpy(patch)[None, None]
                with torch.no_grad():
                    pred = net(x)
                pred = pred[0, 0].numpy()[:ph, :pw]
                denoised[r0:r1, c0:c1] += pred
                contrib[r0:r1, c0:c1] += 1
        return denoised / np.maximum(contrib, 1)

    # warmup
    run_once()
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run_once()
    dt = (time.perf_counter() - t0) / n_rep
    mps = (h * w) / dt / 1e6

    out = {
        "metric": "tiled352_denoise_throughput",
        "value": mps,
        "unit": "MP/s",
        "hardware": "pytorch-cpu",
        "frame": [h, w],
        "tile": ps,
        "overlap": overlap,
        "model": "ImprovedUNet(n_feature=48, grayscale)",
        "seconds_per_frame": dt,
    }
    path = os.path.join(REPO, "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
