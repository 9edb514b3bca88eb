"""Round-3 TPU experiment: --device_metrics on the full eval CLI.

Within ONE process/session (tunnel spread across sessions is ~10%, PERF §9),
times evaluation_704.evaluate() end-to-end on the production preset (bf16,
burst 8, chunk -8, --save_images none) in two modes over the same 48
synthetic 704^2 frames:

  host   — reference metrics pass: fetch every prediction, PSNR + native
           MATLAB-SSIM on the 1-core host (lazy-overlapped with bursts).
  device — --device_metrics: PSNR/SSIM fused on the TPU; per-frame D2H is
           three scalars.

Both modes share the denoise runner program (one compile); the device mode
adds one small metrics program. Reports s/frame and MP/s per mode, min of
reps. Run: python scripts/bench_cli_device_metrics.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 48
H = W = 704
REPS = 3


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax

    from image_denoising_tpu.ckpt import save_checkpoint
    from image_denoising_tpu.cli.evaluation_704 import evaluate, parse_args
    from image_denoising_tpu.models import ImprovedUNet

    emit(kind="env", devices=[str(d) for d in jax.devices()])

    root = tempfile.mkdtemp(prefix="cli_dm_")
    from PIL import Image

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    ds = os.path.join(root, "data")
    for sub in ("clean", "noise"):
        os.makedirs(os.path.join(ds, sub))
    for i in range(N_FRAMES):
        clean = (120 + 60 * np.sin(xx / 30 + i) + 30 * np.cos(yy / 17)).astype(np.uint8)
        noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255).astype(np.uint8)
        Image.fromarray(clean).save(os.path.join(ds, "clean", f"sem_{i:02d}.png"))
        Image.fromarray(noisy).save(os.path.join(ds, "noise", f"sem_{i:02d}.png"))

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32))["params"]
    ckpt_dir = os.path.join(root, "ckpt")
    save_checkpoint(params, ckpt_dir, "model", 1)
    ckpt = os.path.join(ckpt_dir, "epoch_model_001.ckpt")

    base = [
        "--data_dir", ds, "--checkpoint", ckpt,
        "--save_dir", os.path.join(root, "out"),
        "--n_feature", "48", "--log_name", "UNetImproved",
        "--dtype", "bfloat16", "--frame_burst", "8", "--tile_batch", "-8",
        "--save_images", "none",
    ]
    results = {}
    for mode, extra in (("host", []), ("device", ["--device_metrics"])):
        opt = parse_args(base + extra)
        walls, psnrs = [], []
        for rep in range(REPS):
            t0 = time.perf_counter()
            avg = evaluate(opt)
            walls.append(time.perf_counter() - t0)
            psnrs.append(avg["psnr"])
            emit(kind="cli_run", mode=mode, rep=rep,
                 wall_s=round(walls[-1], 1), psnr=round(avg["psnr"], 3),
                 ssim=round(avg["ssim"], 5))
        spf = min(walls) / N_FRAMES
        results[mode] = spf
        emit(kind="steady_state", mode=mode, s_per_frame=round(spf, 3),
             mps=round(H * W / 1e6 / spf, 2))
    emit(kind="summary",
         host_spf=round(results["host"], 3),
         device_spf=round(results["device"], 3),
         speedup=round(results["host"] / results["device"], 2))


if __name__ == "__main__":
    main()
