"""Round-3 TPU experiment: FULL eval-CLI wall time with lazy burst draining.

bench.py times the denoise pipeline alone; a real user runs the CLI, which
also computes PSNR/SSIM/IQ metrics and writes three PNGs per frame on the
host. PERF §9 measured that host pass at 0.3-0.5 s/frame on this 1-core box
— more than the ~0.07 s/frame of device denoise — so round 3 made the burst
CLIs drain lazily (metrics for frame i overlap device work on bursts i+1..).

This times `evaluation_704.evaluate()` end-to-end on the production preset
(scripts/eval_704_tpu_fast.sh: bf16, --frame_burst 8, --tile_batch -8) over
48 synthetic 704² frames, three reps in one process. Rep behavior on this
backend is compile-cache-dependent (an evaluate() call MAY pay a 17-80 s
backend compile even when the server has the HLO cached — cProfile-verified
once; the next identical call can hit the in-process pjit cache), so the
steady state is the MINIMUM rep, cross-checked for consistency across reps.
Reports s/frame and MP/s INCLUDING PSNR/SSIM metrics and the --save_images
PNG writes. Measured 2026-08-17: 0.66-0.68 s/frame (0.73-0.75 MP/s) with
--save_images all; the denoise pipeline alone runs 6.7 MP/s (PERF §9).

Run: python scripts/bench_cli_e2e.py [--save_images all|denoised|none]
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax

    from image_denoising_tpu.ckpt import save_checkpoint
    from image_denoising_tpu.cli.evaluation_704 import evaluate, parse_args
    from image_denoising_tpu.models import ImprovedUNet

    emit(kind="env", devices=[str(d) for d in jax.devices()])

    root = tempfile.mkdtemp(prefix="cli_e2e_")
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

    save_images = "all"
    if "--save_images" in sys.argv:
        save_images = sys.argv[sys.argv.index("--save_images") + 1]
    argv = [
        "--data_dir", ds, "--checkpoint", ckpt,
        "--save_dir", os.path.join(root, "out"),
        "--n_feature", "48", "--log_name", "UNetImproved",
        "--dtype", "bfloat16", "--frame_burst", "8", "--tile_batch", "-8",
        "--save_images", save_images,
    ]
    if "--device_metrics" in sys.argv:
        argv.append("--device_metrics")
    if "--host_workers" in sys.argv:
        argv += ["--host_workers", sys.argv[sys.argv.index("--host_workers") + 1]]
    opt = parse_args(argv)
    walls = []
    for rep in range(3):
        t0 = time.perf_counter()
        avg = evaluate(opt)
        walls.append(time.perf_counter() - t0)
        emit(kind="cli_run", rep=rep, wall_s=round(walls[-1], 1),
             psnr=round(avg["psnr"], 2))
    spf = min(walls) / N_FRAMES
    emit(kind="cli_steady_state", save_images=save_images,
         device_metrics=bool(opt.device_metrics),
         host_workers=getattr(opt, "host_workers", 0),
         s_per_frame=round(spf, 3), mps=round(H * W / 1e6 / spf, 2),
         note="min of %d reps x %d frames" % (len(walls), N_FRAMES))


if __name__ == "__main__":
    main()
