"""Real-TPU validation for --host_workers (PERF §9.2).

The HostWorkPool worker threads fetch device results (np.asarray /
float() D2H) concurrently with main-thread JAX dispatch. PjRt is
thread-safe by contract, but the axon remote tunnel has violated JAX
contracts before (CLAUDE.md: early block_until_ready returns), and the
CPU-mesh e2e test cannot exercise the tunnel. This runs the tiled eval
CLI inline and with --host_workers 2 on the REAL device in one process
and requires byte-identical outputs.

Run: python scripts/tpu_host_workers_check.py   (prints PASS/FAIL)
"""

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FRAMES = 8
H = W = 704


def main():
    import jax
    from PIL import Image

    from image_denoising_tpu.ckpt import save_checkpoint
    from image_denoising_tpu.cli.evaluation_704 import evaluate, parse_args
    from image_denoising_tpu.models import ImprovedUNet

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    root = tempfile.mkdtemp(prefix="hw_check_")
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

    # the production preset (bf16, burst 8, chunk -8) so the worker threads
    # race the burst pipeline's own staging fetches too
    base = [
        "--data_dir", ds, "--checkpoint", ckpt,
        "--n_feature", "48", "--log_name", "UNetImproved",
        "--dtype", "bfloat16", "--frame_burst", "8", "--tile_batch", "-8",
        "--compute_iq_iou",
    ]
    out_a = os.path.join(root, "inline")
    out_b = os.path.join(root, "pooled")
    avg_a = evaluate(parse_args(base + ["--save_dir", out_a]))
    avg_b = evaluate(parse_args(
        base + ["--save_dir", out_b, "--host_workers", "2"]))

    ok = avg_a == avg_b
    files_a = sorted(os.listdir(out_a))
    ok = ok and files_a == sorted(os.listdir(out_b))
    for f in files_a:
        a = open(os.path.join(out_a, f), "rb").read()
        b = open(os.path.join(out_b, f), "rb").read()
        if a != b:
            ok = False
            print(json.dumps({"mismatch": f}), flush=True)
    print(json.dumps({"host_workers_tpu_check": "PASS" if ok else "FAIL",
                      "avg_inline": avg_a, "avg_pooled": avg_b}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
