"""Whole-image evaluation CLI — reference-compatible ``evaluation.py``.

Semantics (``evaluation.py:23-117``): one full-frame forward per noisy image,
L1 recorded against the *noisy input* (self-consistency proxy — documented
reference behavior), PNGs for noisy/clean/denoised, PSNR/SSIM vs clean,
averages to ``metrics.txt``. uint8 via clip(p·255 + 0.5).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="./dataset/m1")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help=".ckpt (native) or .pth (reference) base checkpoint")
    parser.add_argument("--save_dir", type=str, default="./eval_results")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--log_name", type=str, default="UNetImproved")
    parser.add_argument("--arch", type=str, default=None,
                        help="explicit architecture (overrides log_name dispatch)")
    parser.add_argument("--gpu_devices", default="0", type=str,
                        help="accepted for reference compatibility; unused on TPU")
    parser.add_argument("--save_images", type=str, default="all",
                        choices=["all", "denoised", "none"],
                        help="which PNGs to write per frame ('all' mirrors "
                             "the reference; see docs/PERF.md §9)")
    parser.add_argument("--device_metrics", action="store_true",
                        help="fuse quantization + PSNR/SSIM into the forward "
                             "program on the TPU (f32 ssim_jax, ~1e-6 from "
                             "the host float64 MATLAB-SSIM). With "
                             "--save_images none the prediction is never "
                             "fetched to the host.")
    from .common import (add_blindspot_flag, add_dtype_flag,
                         add_host_workers_flag)

    add_blindspot_flag(parser)
    add_dtype_flag(parser)
    add_host_workers_flag(parser)
    return parser.parse_args(argv)


def evaluate(opt):
    import jax.numpy as jnp

    from ..data import validation_denoise
    from ..metrics import calculate_psnr, calculate_ssim
    from .common import (HostWorkPool, MetricsWriter, build_network,
                         jitted_apply, load_params, make_metrics_finalize,
                         resolve_dtype, save_png)

    os.makedirs(opt.save_dir, exist_ok=True)
    clean_imgs, noisy_imgs, clean_paths, noisy_paths = validation_denoise(opt.data_dir)

    network = build_network(opt.arch, opt.log_name, opt.n_channel, opt.n_feature,
                            dtype=resolve_dtype(getattr(opt, "dtype", None)),
                            blindspot=getattr(opt, "blindspot", False))
    params = load_params(opt.checkpoint, network)
    fwd = jitted_apply(network, params)
    print(f"Loaded checkpoint from {opt.checkpoint}")

    # --device_metrics: ONE jitted program per frame shape runs the forward,
    # the reference's clip(p·255+0.5) quantization, L1-vs-noisy, PSNR and
    # MATLAB-SSIM entirely on device; only scalars (and the uint8 prediction,
    # when PNGs are requested) come back to the host.
    scorer_cache: dict = {}

    def _device_scorer(shape):
        import jax

        from ..metrics import frame_psnr_ssim

        @jax.jit
        def score(noisy_f, clean_u8):
            x = noisy_f / 255.0
            x3 = x[..., None] if x.ndim == 2 else x
            pred = fwd(x3[None])[0]
            l1 = jnp.mean(jnp.abs(pred - x3))
            pred255 = jnp.clip(
                jnp.clip(pred, 0.0, 1.0).squeeze() * 255.0 + 0.5, 0, 255
            ).astype(jnp.uint8)
            psnr, ssim = frame_psnr_ssim(pred255, clean_u8)
            return pred255, l1, psnr, ssim

        return score

    writer = MetricsWriter()
    save_mode = getattr(opt, "save_images", "all")

    # host path: L1 computed inside ONE jitted program with the forward —
    # eager per-frame jnp ops would pay ~1 round-trip each on the tunneled
    # TPU (CLAUDE.md: never loop eager ops over the device)
    import jax

    @jax.jit
    def _fwd_l1(x3):
        pred = fwd(x3[None])[0]
        return pred, jnp.mean(jnp.abs(pred - x3))

    def _host_pass(i, clean_name, noisy_name, clean255, noisy255, dev):
        """Fetch one frame's device results and run its host pass.

        The forward was dispatched asynchronously in the main loop; this
        fetch (and PSNR/SSIM/PNG when on the host path) runs inline by
        default or in the --host_workers pool, finalizing in frame order.
        """
        if len(dev) == 4:  # --device_metrics: scalars (+ pred for PNGs)
            pred_dev, l1_dev, psnr_dev, ssim_dev = dev
            pred255 = np.asarray(pred_dev) if save_mode != "none" else None
            l1_val = float(l1_dev)
            psnr_val = float(psnr_dev)
            ssim_val = float(ssim_dev)
        else:
            pred, l1_dev = dev
            l1_val = float(l1_dev)
            pred_np = np.clip(np.asarray(pred), 0, 1).squeeze()
            pred255 = np.clip(pred_np * 255.0 + 0.5, 0, 255).astype(np.uint8)
            psnr_val = calculate_psnr(pred255, clean255, zero_mse_psnr=None)
            ssim_val = calculate_ssim(pred255, clean255)

        if save_mode == "all":
            save_png(noisy255, os.path.join(opt.save_dir, f"{noisy_name}_{i:03d}_noisy.png"))
            save_png(clean255, os.path.join(opt.save_dir, f"{clean_name}_{i:03d}_clean.png"))
        if save_mode != "none":
            save_png(pred255, os.path.join(opt.save_dir, f"{noisy_name}_{i:03d}_denoised.png"))
        msg = (
            f"[{i + 1}/{len(clean_imgs)}] {noisy_name} -> "
            f"PSNR: {psnr_val:.2f}, SSIM: {ssim_val:.4f}, L1: {l1_val:.6f}"
        )
        return msg, dict(psnr=psnr_val, ssim=ssim_val, l1=l1_val)

    with HostWorkPool(getattr(opt, "host_workers", 0),
                      make_metrics_finalize(writer)) as pool:
        for i, (clean, noisy) in enumerate(zip(clean_imgs, noisy_imgs)):
            clean_name = os.path.basename(clean_paths[i]).split(".")[0]
            noisy_name = os.path.basename(noisy_paths[i]).split(".")[0]

            noisy_f = np.asarray(noisy, dtype=np.float32)
            clean255 = np.asarray(clean).astype(np.uint8)
            noisy255 = noisy_f.astype(np.uint8)

            if getattr(opt, "device_metrics", False):
                key = (np.shape(noisy_f), np.shape(clean255))
                score = scorer_cache.get(key)
                if score is None:
                    score = scorer_cache[key] = _device_scorer(key)
                dev = score(jnp.asarray(noisy_f), jnp.asarray(clean255))
            else:
                x = noisy_f / 255.0
                if x.ndim == 2:
                    x = x[..., None]
                dev = _fwd_l1(jnp.asarray(x))

            pool.submit(_host_pass, i, clean_name, noisy_name, clean255,
                        noisy255, dev)

    writer.write(opt.save_dir)
    avg = writer.averages()
    print(
        f"Average PSNR: {avg['psnr']:.2f}, Average SSIM: {avg['ssim']:.4f}, "
        f"Average L1 Loss: {avg['l1']:.6f}"
    )
    return avg


def main(argv=None):
    return evaluate(parse_args(argv))


if __name__ == "__main__":
    main()
