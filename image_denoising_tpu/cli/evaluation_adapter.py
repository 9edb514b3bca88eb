"""Adapter inference CLI — reference-compatible ``evaluation_adapter.py``.

Loads a COMBINED base+adapter wrapper checkpoint (--ckpt), denoises every
frame under ``data_dir/noise/`` whole-frame, saves ``*_denoised.png``
(clip(p·255+0.5)), and prints PSNR when ``clean/`` exists.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="combined DenoiserWithAdapter ckpt (epoch_adapter_xxx)")
    parser.add_argument("--arch", type=str, default="UNetImproved",
                        choices=["UNet", "RESNET", "UNetImproved"])
    parser.add_argument("--save_dir", type=str, default="./results_infer_adapter")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--adapter_hidden", type=int, default=16)
    parser.add_argument("--save_images", type=str, default="denoised",
                        choices=["denoised", "none"],
                        help="'denoised' writes *_denoised.png per frame "
                             "(the reference behavior); 'none' computes "
                             "metrics only (PNG encode dominates host wall "
                             "on a 1-core box, docs/PERF.md §9)")
    from .common import add_dtype_flag, add_host_workers_flag

    add_dtype_flag(parser)
    add_host_workers_flag(parser)
    args, _ = parser.parse_known_args(argv)
    return args


def load_wrapper_params(ckpt_path: str, arch: str):
    """Combined wrapper checkpoint → {"base": ..., "adapter": ...} params."""
    if ckpt_path.endswith(".pth"):
        from ..ckpt.pth_import import import_pth, load_state_dict

        sd = load_state_dict(ckpt_path)
        return {
            "base": import_pth(sd, arch, prefix="base"),
            "adapter": import_pth(
                {k[len("adapter."):]: v for k, v in sd.items()
                 if k.startswith("adapter.")},
                "output_adapter",
            ),
        }
    from ..ckpt import load_checkpoint

    return load_checkpoint(ckpt_path)


def main(argv=None):
    opt = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..adapters import DenoiserWithAdapter
    from ..data.pairs import load_image_f32
    from ..metrics import calculate_psnr
    from ..models.registry import build_model
    from .common import (HostWorkPool, batched_frame_forward, resolve_dtype,
                         save_png)

    noise_dir = os.path.join(opt.data_dir, "noise")
    clean_dir = os.path.join(opt.data_dir, "clean")
    os.makedirs(opt.save_dir, exist_ok=True)

    noise_paths = sorted(glob.glob(os.path.join(noise_dir, "*")))
    if not noise_paths:
        raise RuntimeError(f"No files found in {noise_dir}")
    clean_paths = sorted(glob.glob(os.path.join(clean_dir, "*")))
    has_clean = len(clean_paths) > 0
    if has_clean and len(clean_paths) != len(noise_paths):
        print("[Warning] clean/ and noise/ have different counts; PSNR may be misaligned.")
    print(f"Found {len(noise_paths)} noisy images for inference.")

    base = build_model(opt.arch, opt.n_channel, opt.n_feature,
                       dtype=resolve_dtype(getattr(opt, "dtype", None)))
    wrapper = DenoiserWithAdapter(
        base=base, in_channels=opt.n_channel, hidden_channels=opt.adapter_hidden
    )
    params = load_wrapper_params(opt.ckpt, opt.arch)
    print(f"Loaded adapter+base weights from {opt.ckpt}")

    @jax.jit
    def fwd(p, x):
        return wrapper.apply({"params": p}, x)

    frames = []
    for n_path in noise_paths:
        x = load_image_f32(n_path) / 255.0
        frames.append(x[..., None] if x.ndim == 2 else x)
    preds = batched_frame_forward(fwd, params, frames,
                                  parallel=opt.parallel)

    psnrs = []

    def _finalize(res):
        msg, psnr = res
        if psnr is not None:
            psnrs.append(psnr)
        print(msg)

    def _host_pass(idx, n_path):
        base_name = os.path.splitext(os.path.basename(n_path))[0]
        pred = preds[idx]
        pred255 = np.clip(pred * 255.0 + 0.5, 0, 255).astype(np.uint8)
        note = "metrics only"
        if getattr(opt, "save_images", "denoised") != "none":
            vis = pred255.squeeze(-1) if pred255.shape[-1] == 1 else pred255
            save_path = os.path.join(opt.save_dir, f"{base_name}_denoised.png")
            save_png(vis, save_path, mode="L" if vis.ndim == 2 else "RGB")
            note = f"saved to {save_path}"

        psnr = None
        if has_clean and idx < len(clean_paths):
            clean_img = load_image_f32(clean_paths[idx])
            psnr = calculate_psnr(pred255.squeeze(), clean_img)
            msg = (f"[{idx + 1:03d}/{len(noise_paths):03d}] {base_name} → "
                   f"PSNR={psnr:.2f} dB, {note}")
        else:
            msg = f"[{idx + 1:03d}/{len(noise_paths):03d}] {base_name} → {note}"
        return msg, psnr

    with HostWorkPool(getattr(opt, "host_workers", 0), _finalize) as pool:
        for idx, n_path in enumerate(noise_paths):
            pool.submit(_host_pass, idx, n_path)

    print("Inference with adapter model finished.")
    return float(np.mean(psnrs)) if psnrs else None


if __name__ == "__main__":
    main()
