"""Adapter inference + IQ-IoU CLI — reference-compatible
``evaluation_adapter_iqsl.py``.

Unlike evaluation_adapter this loads the base checkpoint and the ADAPTER-ONLY
checkpoint separately (--base_ckpt / --adapter_ckpt), and adds the 3-class
intensity-quantized IoU.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--base_ckpt", type=str, required=True)
    parser.add_argument("--adapter_ckpt", type=str, required=True,
                        help="adapter-only ckpt (epoch_adapter_only_xxx)")
    parser.add_argument("--arch", type=str, default="UNetImproved",
                        choices=["UNet", "RESNET", "UNetImproved"])
    parser.add_argument("--save_dir", type=str, default="./results_infer_adapter_iqsl")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--adapter_hidden", type=int, default=16)
    parser.add_argument("--compute_iq_iou", action="store_true")
    parser.add_argument("--iq_low_q", type=float, default=0.25)
    parser.add_argument("--iq_high_q", type=float, default=0.75)
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


def main(argv=None):
    opt = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..adapters import DenoiserWithAdapter
    from ..ckpt import load_checkpoint
    from ..data.pairs import load_image_f32
    from ..metrics import calculate_psnr, calculate_ssim, compute_iq_iou
    from ..models.registry import build_model
    from .common import (HostWorkPool, MetricsWriter, batched_frame_forward,
                         make_metrics_finalize, resolve_dtype, save_png)

    os.makedirs(opt.save_dir, exist_ok=True)
    noise_paths = sorted(glob.glob(os.path.join(opt.data_dir, "noise", "*")))
    clean_paths = sorted(glob.glob(os.path.join(opt.data_dir, "clean", "*")))
    if not noise_paths:
        raise RuntimeError(f"No files under {opt.data_dir}/noise")
    has_clean = len(clean_paths) > 0

    base = build_model(opt.arch, opt.n_channel, opt.n_feature,
                       dtype=resolve_dtype(getattr(opt, "dtype", None)))
    wrapper = DenoiserWithAdapter(
        base=base, in_channels=opt.n_channel, hidden_channels=opt.adapter_hidden
    )
    base_params = load_checkpoint(opt.base_ckpt, arch=opt.arch)
    adapter_params = load_checkpoint(opt.adapter_ckpt, arch="output_adapter")
    params = {"base": base_params, "adapter": adapter_params}
    print(f"Loaded base from {opt.base_ckpt}; adapter from {opt.adapter_ckpt}")

    @jax.jit
    def fwd(p, x):
        return wrapper.apply({"params": p}, x)

    frames = []
    for n_path in noise_paths:
        x = load_image_f32(n_path) / 255.0
        frames.append(x[..., None] if x.ndim == 2 else x)
    preds = batched_frame_forward(fwd, params, frames, parallel=opt.parallel)

    writer = MetricsWriter()

    def _host_pass(idx, n_path):
        base_name = os.path.splitext(os.path.basename(n_path))[0]
        pred255 = np.clip(preds[idx] * 255.0 + 0.5, 0, 255).astype(np.uint8).squeeze()
        if getattr(opt, "save_images", "denoised") != "none":
            save_png(pred255,
                     os.path.join(opt.save_dir, f"{base_name}_denoised.png"),
                     mode="L" if pred255.ndim == 2 else "RGB")

        if not (has_clean and idx < len(clean_paths)):
            return None
        clean_img = load_image_f32(clean_paths[idx])
        clean255 = clean_img.astype(np.uint8)
        psnr = calculate_psnr(pred255, clean255)
        ssim = calculate_ssim(pred255, clean255)
        ious = None
        msg = f"[{idx + 1}/{len(noise_paths)}] {base_name} -> PSNR: {psnr:.2f}, SSIM: {ssim:.4f}"
        if opt.compute_iq_iou:
            ious = compute_iq_iou(pred255, clean255, opt.iq_low_q, opt.iq_high_q)
            msg += f", IoU(d/m/b)=({ious[0]:.3f},{ious[1]:.3f},{ious[2]:.3f})"
        return msg, dict(psnr=psnr, ssim=ssim, ious=ious)

    with HostWorkPool(getattr(opt, "host_workers", 0),
                      make_metrics_finalize(writer, skip_none=True)) as pool:
        for idx, n_path in enumerate(noise_paths):
            pool.submit(_host_pass, idx, n_path)

    if has_clean:
        writer.write(opt.save_dir)
    return writer.averages()


if __name__ == "__main__":
    main()
