"""Tiled "704" evaluation CLI — reference-compatible ``evaluation_704.py``.

352×352 tiles, 64-px overlap (stride 288), reflect-padded ragged edge tiles,
pyramid weight blending, uint8 via clip(p·255) with NO +0.5 (reference quirk,
``evaluation_704.py:120``). All tiles run as ONE batched jitted forward with
the blend fused on device (vs. the reference's per-tile host round trips).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default="./dataset/m1")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--save_dir", type=str, default="./eval_results")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--log_name", type=str, default="UNetImproved")
    parser.add_argument("--arch", type=str, default=None)
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true",
                        help="shard the tile batch over all devices in the "
                             "mesh (the reference's DataParallel analog)")
    parser.add_argument("--tile", type=int, default=352)
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--tile_batch", type=int, default=-1,
                        help="forward chunk size; 0 = all tiles in one batch, "
                             "-k = lax.map scan over k-tile chunks (-1 default;"
                             " -8 fills the TPU sublane dim — fastest with "
                             "--frame_burst, see docs/PERF.md)")
    parser.add_argument("--frame_burst", type=int, default=0,
                        help="process N same-shape frames per device dispatch "
                             "(serving-throughput mode; 8 with --tile_batch -8 "
                             "reaches the bench numbers). 0 = frame-by-frame "
                             "like the reference.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler device trace of the "
                             "denoise loop to this directory")
    parser.add_argument("--save_images", type=str, default="all",
                        choices=["all", "denoised", "none"],
                        help="which PNGs to write per frame. 'all' mirrors "
                             "the reference (noisy + clean + denoised — the "
                             "first two are copies of the inputs); 'denoised' "
                             "skips the input copies; 'none' computes metrics "
                             "only. PNG encode is a large share of eval wall "
                             "time on a 1-core host (docs/PERF.md §9).")
    parser.add_argument("--device_metrics", action="store_true",
                        help="score PSNR/SSIM — and IQ-IoU with "
                             "--compute_iq_iou — on the TPU instead of the "
                             "host (float32 ssim_jax, ~1e-6 from the host "
                             "float64 MATLAB-SSIM; PSNR identical). "
                             "Predictions stay device-resident, so with "
                             "--save_images none the per-frame D2H is a "
                             "handful of scalars — removes the 1-core host "
                             "metrics bottleneck (PERF §9). Implies the "
                             "burst pipeline (frame_burst >= 1).")
    # IQ-IoU options (evaluation_704_iqsl.py adds these; harmless here)
    parser.add_argument("--compute_iq_iou", action="store_true")
    parser.add_argument("--iq_low_q", type=float, default=0.25)
    parser.add_argument("--iq_high_q", type=float, default=0.75)
    from .common import (add_blindspot_flag, add_dtype_flag,
                         add_host_workers_flag)

    add_blindspot_flag(parser)
    add_dtype_flag(parser)
    add_host_workers_flag(parser)
    return parser.parse_args(argv)


def evaluate(opt):
    from ..data import validation_denoise
    from ..eval import denoise_tiled_pyramid
    from ..metrics import calculate_psnr, calculate_ssim, compute_iq_iou
    from .common import (HostWorkPool, MetricsWriter, build_network,
                         drain_burst, jitted_apply, load_params,
                         make_metrics_finalize, resolve_dtype, save_png)

    os.makedirs(opt.save_dir, exist_ok=True)
    clean_imgs, noisy_imgs, clean_paths, noisy_paths = validation_denoise(opt.data_dir)

    network = build_network(opt.arch, opt.log_name, opt.n_channel, opt.n_feature,
                            dtype=resolve_dtype(getattr(opt, "dtype", None)),
                            blindspot=getattr(opt, "blindspot", False))
    params = load_params(opt.checkpoint, network)
    fwd = jitted_apply(network, params)
    print(f"Loaded checkpoint from {opt.checkpoint}")

    mesh = None
    tile_batch = opt.tile_batch
    if opt.parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()
        if tile_batch < 0:
            # a lax.map tile scan is sequential; mesh sharding needs the
            # whole tile batch in one forward
            tile_batch = 0
        print(f"tile-parallel over {mesh.devices.size} devices")

    profiling = False
    if getattr(opt, "profile_dir", None):
        import jax

        jax.profiler.start_trace(opt.profile_dir)
        profiling = True

    # --frame_burst: denoise N same-shape frames per dispatch, up to three
    # bursts in flight so transfers overlap compute (the bench pipeline
    # shape). With --parallel the burst's flattened tile stack shards over
    # the mesh. The burst stream is LAZY: the metrics loop below pulls
    # drained frames on demand, so host-side SSIM/PNG work for early frames
    # overlaps device compute of later bursts instead of serializing after
    # it (one CPU core makes the metrics pass comparable to denoise time).
    pred_cache: dict = {}
    burst_stream = None
    device_metrics = bool(getattr(opt, "device_metrics", False))
    save_mode = getattr(opt, "save_images", "all")
    # --device_metrics needs device-resident predictions → burst pipeline
    # (a 1-frame burst still avoids the fetch/re-upload round trip)
    fetch_pred = (not device_metrics) or save_mode != "none"
    if (getattr(opt, "frame_burst", 0) and opt.frame_burst > 1) or device_metrics:
        from ..eval.tiled import make_tiled_pyramid_runner_frames

        fb = max(int(getattr(opt, "frame_burst", 0) or 0), 1)
        metrics_fn = None
        if device_metrics:
            from ..metrics import make_device_metrics

            # --compute_iq_iou scores on device too, so predictions can
            # stay device-resident even for the fully-scored pipeline
            metrics_fn = make_device_metrics(
                iq_iou=opt.compute_iq_iou,
                low_q=opt.iq_low_q, high_q=opt.iq_high_q,
            )
        by_shape: dict = {}
        for j, nz in enumerate(noisy_imgs):
            assert np.ndim(nz) == 2, (
                f"tiled pyramid eval is single-channel: frame {j} has shape "
                f"{np.shape(nz)}"
            )
            if device_metrics:
                assert np.shape(clean_imgs[j]) == np.shape(nz), (
                    f"--device_metrics scores on device per shape bucket: "
                    f"clean/noisy shapes differ for frame {j} "
                    f"({np.shape(clean_imgs[j])} vs {np.shape(nz)})"
                )
            by_shape.setdefault(np.shape(nz), []).append(j)

        from .common import iter_bursts, make_clean_post

        def make_runner(h, w):
            return make_tiled_pyramid_runner_frames(
                fwd, fb, h, w, opt.tile, opt.overlap, batch=tile_batch,
                out_dtype="uint8_floor", mesh=mesh,
            )

        post = None
        if metrics_fn is not None:
            # score the still-device-resident burst against its clean frames
            # (the runner returns (preds, l1) — pick_pred selects the preds)
            post = make_clean_post(
                lambda j: np.asarray(clean_imgs[j], np.uint8), fb,
                metrics_fn, pick_pred=lambda out: out[0],
            )

        burst_stream = iter_bursts(
            by_shape, lambda j: np.asarray(noisy_imgs[j], np.uint8), fb,
            make_runner, post=post,
        )

    writer = MetricsWriter()

    def _host_pass(i, clean_name, noisy_name, clean_u8, noisy_u8, pred255,
                   l1_val, dev_m):
        """One frame's host work: PNG encodes + (host-path) metrics.

        Runs inline by default; with --host_workers N it runs in a thread
        pool (SSIM + PNG release the GIL) and finalizes in frame order.
        """
        if save_mode == "all":
            save_png(noisy_u8, os.path.join(opt.save_dir, f"{noisy_name}_{i:03d}_noisy.png"), mode=None)
            save_png(clean_u8, os.path.join(opt.save_dir, f"{clean_name}_{i:03d}_clean.png"), mode=None)
        if save_mode != "none":
            save_png(pred255, os.path.join(opt.save_dir, f"{noisy_name}_{i:03d}_denoised.png"), mode=None)

        ious = None
        if dev_m is not None:
            psnr_val, ssim_val = float(dev_m[0]), float(dev_m[1])
            if len(dev_m) > 2:
                ious = [float(v) for v in dev_m[2]]
        else:
            psnr_val = calculate_psnr(pred255, clean_u8, zero_mse_psnr=None)
            ssim_val = calculate_ssim(pred255, clean_u8)
        msg = (
            f"[{i + 1}/{len(clean_imgs)}] {noisy_name} -> "
            f"PSNR: {psnr_val:.2f}, SSIM: {ssim_val:.4f}, L1: {l1_val:.6f}"
        )
        if opt.compute_iq_iou:
            if ious is None:
                ious = compute_iq_iou(pred255, clean_u8, opt.iq_low_q, opt.iq_high_q)
            msg += f", IoU(d/m/b)=({ious[0]:.3f},{ious[1]:.3f},{ious[2]:.3f})"
        return msg, dict(psnr=psnr_val, ssim=ssim_val, l1=l1_val, ious=ious)

    with HostWorkPool(getattr(opt, "host_workers", 0),
                      make_metrics_finalize(writer)) as pool:
        for i, (clean, noisy) in enumerate(zip(clean_imgs, noisy_imgs)):
            clean_name = os.path.basename(clean_paths[i]).split(".")[0]
            noisy_name = os.path.basename(noisy_paths[i]).split(".")[0]

            clean_u8 = np.asarray(clean).astype(np.uint8)
            noisy_u8 = np.asarray(noisy).astype(np.uint8)

            dev_m = None
            if burst_stream is not None:
                while i not in pred_cache:
                    # runner output is (preds, l1): cache (pred, l1, metrics)
                    drain_burst(next(burst_stream), pred_cache, fetch_pred,
                                pick=lambda out: (out[0], (out[1],)))
                pred255, l1_val, dev_m = pred_cache.pop(i)
                l1_val = float(l1_val)
            else:
                # uint8 quantization (reference: clip(p·255), NO +0.5) on device
                pred255, l1_val = denoise_tiled_pyramid(
                    fwd, noisy_u8, ps=opt.tile, overlap=opt.overlap,
                    batch=tile_batch, out_dtype="uint8_floor", mesh=mesh,
                )

            pool.submit(_host_pass, i, clean_name, noisy_name, clean_u8,
                        noisy_u8, pred255, l1_val, dev_m)

    if profiling:
        import jax

        jax.profiler.stop_trace()
        print(f"profiler trace written to {opt.profile_dir}")

    writer.write(opt.save_dir)
    avg = writer.averages()
    print(
        f"Average PSNR: {avg['psnr']:.2f}, Average SSIM: {avg['ssim']:.4f}, "
        f"Average L1 Loss: {avg['l1']:.6f}"
    )
    if opt.compute_iq_iou and "iou_dark" in avg:
        print(
            "Average IQ-3class IoU - "
            f"dark: {avg['iou_dark']:.4f}, mid: {avg['iou_mid']:.4f}, "
            f"bright: {avg['iou_bright']:.4f}"
        )
    return avg


def main(argv=None):
    return evaluate(parse_args(argv))


if __name__ == "__main__":
    main()
