"""Full user journey on real TPU hardware: train → tiled eval → memory
finetune → memory-bounded eval, at the reference's production geometry
(704² frames, 352 tiles, 128 memory patches).

Run manually: python tests/tpu/run_e2e_tpu.py  (expect ~30–60 min, mostly
XLA remote compiles on this host). Asserts each stage's outputs.
"""
from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def make_dataset(root: str, name: str, n: int = 3, size: int = 704) -> str:
    from PIL import Image

    data = os.path.join(root, name)
    os.makedirs(os.path.join(data, "clean"))
    os.makedirs(os.path.join(data, "noise"))
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size]
    for i in range(n):
        clean = (
            120 + 70 * np.sin(xx / 11.0 + i) + 30 * ((yy // 32 + xx // 32) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 15, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(os.path.join(data, "clean", f"sem_{i:02d}.png"))
        Image.fromarray(noisy).save(os.path.join(data, "noise", f"sem_{i:02d}.png"))
    return data


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    root = tempfile.mkdtemp(prefix="idt_e2e_")
    # reference geometry (SURVEY.md §6): A-domain TRAIN tiles are 352²,
    # B-domain EVAL frames are 704² (704² training OOMs even the reference's
    # GPUs' regime — it was never trained at frame size)
    train_data = make_dataset(root, "a_domain", n=4, size=352)
    data = make_dataset(root, "b_domain", n=3, size=704)

    from image_denoising_tpu.cli import (
        evaluation_704_iqsl,
        evaluation_704_iqsl_memory,
        finetune_memory,
        train,
    )

    t0 = time.time()
    train.main([
        "--data_dir", train_data,
        "--save_model_path", os.path.join(root, "results"),
        "--log_name", "UNetImproved_e2e",
        "--n_feature", "48",
        "--n_epoch", "1",
        "--batchsize", "4",
    ])
    ckpts = glob.glob(os.path.join(root, "results", "**", "epoch_model_001.ckpt"),
                      recursive=True)
    assert ckpts, "trainer produced no checkpoint"
    print(f"[e2e] train OK ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    avg = evaluation_704_iqsl.main([
        "--data_dir", data,
        "--checkpoint", ckpts[0],
        "--save_dir", os.path.join(root, "eval704"),
        "--n_feature", "48",
        "--log_name", "UNetImproved",
        "--compute_iq_iou",
    ])
    assert np.isfinite(avg["psnr"]) and "iou_dark" in avg
    print(f"[e2e] eval_704_iqsl OK psnr={avg['psnr']:.2f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    finetune_memory.main([
        "--data_dir", data,
        "--pretrained_ckpt", ckpts[0],
        "--arch", "UNetImproved",
        "--save_model_path", os.path.join(root, "ft"),
        "--log_name", "mem_e2e",
        "--n_feature", "48",
        "--n_epoch", "1",
        "--batchsize", "2",
        "--patch_size", "128",
        "--patches_per_image", "4",
        "--num_memory_images", "2",
        "--memory_stride", "64",
        "--pallas_retrieval",
        "--bank_dtype", "bfloat16",
    ])
    adapter = os.path.join(root, "ft", "mem_e2e", "epoch_adapter_only_001.ckpt")
    assert os.path.exists(adapter)
    print(f"[e2e] finetune_memory (pallas retrieval, bf16 bank) OK "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    avg = evaluation_704_iqsl_memory.main([
        "--data_dir", data,
        "--base_ckpt", ckpts[0],
        "--adapter_ckpt", adapter,
        "--arch", "UNetImproved",
        "--save_dir", os.path.join(root, "evalmem"),
        "--n_feature", "48",
        "--patch_size", "128",
        "--overlap", "64",
        "--num_memory_images", "2",
        "--memory_stride", "64",
        "--pallas_retrieval",
        "--bank_dtype", "bfloat16",
        "--compute_iq_iou",
    ])
    assert np.isfinite(avg["psnr"])
    print(f"[e2e] evaluation_704_iqsl_memory OK psnr={avg['psnr']:.2f} "
          f"({time.time() - t0:.0f}s)", flush=True)
    print("E2E TPU JOURNEY PASSED")


if __name__ == "__main__":
    main()
