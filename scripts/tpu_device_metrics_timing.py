"""Time the compiled device-metrics programs on the REAL TPU.

The device-metrics CLI bench (scripts/bench_cli_device_metrics.py) showed
device mode ~0.84 s/frame where ~0.12 was expected; this isolates the
scorer: times make_device_metrics over an [8,704,704] uint8 burst for the
three configs (psnr+ssim, psnr-only, psnr+iou) with full scalar fetches,
plus the bare denoise-free H2D of the clean burst, so the CLI bench's gap
can be attributed (scorer exec vs tunnel transfers vs dispatch).

Usage: python scripts/tpu_device_metrics_timing.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

F, H, W = 8, 704, 704


def main():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.metrics import make_device_metrics

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 256, (F, H, W)).astype(np.uint8)
    clean = rng.integers(0, 256, (F, H, W)).astype(np.uint8)

    # H2D cost of one burst pair (what make_clean_post pays per burst)
    t0 = time.perf_counter()
    pd = jax.device_put(pred)
    cd = jax.device_put(clean)
    jax.block_until_ready((pd, cd))
    print(json.dumps({"h2d_pair_s": round(time.perf_counter() - t0, 3),
                      "mbytes": round(2 * pred.nbytes / 1e6, 1)}), flush=True)

    for name, kw in (
        ("psnr_ssim", dict(ssim=True)),
        ("psnr_only", dict(ssim=False)),
        ("psnr_iou", dict(ssim=False, iq_iou=True)),
    ):
        fn = make_device_metrics(**kw)
        out = fn(pd, cd)
        _ = [np.asarray(x) for x in out]  # compile + fetch
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            out = fn(pd, cd)
            vals = [np.asarray(x) for x in out]
            ts.append(time.perf_counter() - t)
        print(json.dumps({
            "scorer": name, "min_s": round(min(ts), 4),
            "med_s": round(float(np.median(ts)), 4),
            "s_per_frame": round(float(np.median(ts)) / F, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
