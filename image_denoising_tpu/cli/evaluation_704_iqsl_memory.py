"""Memory-adapter tiled eval CLI — reference-compatible
``evaluation_704_iqsl_memory.py``.

The memory-bounded full-frame inference path: rebuilds the memory bank from
the first --num_memory_images *test* pairs at eval time (reference behavior —
banks are never checkpointed), loads base + adapter-only checkpoints, and
denoises each frame patchwise (patch --patch_size, overlap --overlap) with
Hann²-window blending. uint8 via clip(p·255 + 0.5). PSNR + optional IQ-IoU.

TPU-native: every frame is ONE fused device program — tile gather → base
forward on all tiles → batched top-1 bank retrieval (one MXU matmul) →
adapter → Hann scatter-add blend.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--base_ckpt", type=str, required=True)
    parser.add_argument("--adapter_ckpt", type=str, required=True)
    parser.add_argument("--arch", type=str, default="UNetImproved",
                        choices=["UNet", "RESNET", "UNetImproved"])
    parser.add_argument("--save_dir", type=str, default="./results_704_eval_adapter_memory")
    parser.add_argument("--gpu_devices", default="0", type=str)
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--adapter_hidden", type=int, default=16)
    parser.add_argument("--patch_size", type=int, default=128)
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--num_memory_images", type=int, default=5)
    parser.add_argument("--memory_stride", type=int, default=4)
    parser.add_argument("--adapter_variant", type=str, default="hyper_gated_fft",
                        choices=["memory_residual", "lowfreq_blend", "tone_curve",
                                 "hyper_gated", "hyper_gated_fft"])
    parser.add_argument("--pallas_retrieval", action="store_true",
                        help="stream the bank through VMEM (Pallas kernel) "
                             "instead of materializing the [B,N] distance matrix")
    parser.add_argument("--bank_sharded", action="store_true",
                        help="shard BOTH banks over the device mesh and "
                             "retrieve with the ring (ppermute) kernel — "
                             "per-chip bank HBM drops to 1/k; implies "
                             "--parallel")
    parser.add_argument("--bank_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16", "int8"],
                        help="noise-bank storage dtype. bf16 halves HBM; "
                             "int8 quarters it AND computes exact integer "
                             "distances on the MXU's double-rate int8 path "
                             "(uint8-sourced patches; composes with "
                             "--pallas_retrieval)")
    parser.add_argument("--clean_bank_dtype", type=str, default="float32",
                        choices=["float32", "uint8"],
                        help="clean-bank storage dtype. uint8 stores the "
                             "source bytes (LOSSLESS for uint8 frames — the "
                             "post-gather /255 restores the exact floats) at "
                             "4x less HBM: the production stride-4 clean "
                             "bank drops 6.9 -> 1.7 GB")
    parser.add_argument("--tile_batch", type=int, default=-8,
                        help="-k = lax.map scan over k-tile chunks; 0 = one "
                             "batch. Default -8 fills the TPU sublane dim "
                             "(+70%% over -1 on this engine, docs/PERF.md)")
    parser.add_argument("--frame_burst", type=int, default=0,
                        help="denoise N same-shape frames per device dispatch "
                             "(two bursts in flight so transfers overlap "
                             "compute — the bench pipeline shape, here for "
                             "the memory/Hann engine). 0 = frame-by-frame "
                             "like the reference.")
    parser.add_argument("--save_images", type=str, default="denoised",
                        choices=["denoised", "none"],
                        help="'denoised' writes *_denoised_mem.png per frame "
                             "(the reference's only output image); 'none' "
                             "computes metrics only (PNG encode is a large "
                             "share of eval wall on a 1-core host, PERF §9)")
    parser.add_argument("--compute_iq_iou", action="store_true")
    parser.add_argument("--iq_low_q", type=float, default=0.25)
    parser.add_argument("--iq_high_q", type=float, default=0.75)
    parser.add_argument("--device_metrics", action="store_true",
                        help="score PSNR (and IQ-IoU with --compute_iq_iou) "
                             "on the TPU; with --save_images none predictions "
                             "stay device-resident and the per-frame D2H is "
                             "a handful of scalars (PERF §9.1). Implies the "
                             "burst pipeline (frame_burst >= 1).")
    parser.add_argument("--hoist_retrieval", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="retrieve ALL tiles' memory patches in one pass "
                             "(128-query MXU-row chunks) before the tile-scan "
                             "forward, instead of re-sweeping the bank from "
                             "HBM inside every --tile_batch chunk — ~16x less "
                             "bank traffic at the production stride-4 bank. "
                             "--no_hoist_retrieval restores the per-chunk "
                             "retrieval (A/B + the --bank_sharded ring path, "
                             "which always retrieves per chunk).")
    parser.add_argument("--retrieval_chunk", type=int, default=0,
                        help="query-chunk size for the hoisted retrieval "
                             "pass. 0 (default) = ONE pass over the whole "
                             "tile stack — the retrieval dot is bound per "
                             "bank sweep, not per query row, so one big pass "
                             "beats 128-query chunks ~4x at the production "
                             "bank (scripts/tpu_retrieval_qbatch_sweep.py, "
                             "docs/PERF.md §7.2). Positive values restore "
                             "fixed-size chunking (the round-4 behavior at "
                             "128). Outputs are identical either way.")
    parser.add_argument("--timing_json", type=str, default=None,
                        help="write per-burst drain timestamps (wall seconds "
                             "since CLI start, drained frame indices, frame "
                             "pixel count) to this path — the steady-state "
                             "throughput protocol: late drain-to-drain gaps "
                             "exclude compile AND the max_inflight pre-"
                             "executed backlog (scripts/tpu_memory_"
                             "production.py, PERF §7)")
    from .common import add_dtype_flag, add_host_workers_flag

    add_dtype_flag(parser)
    add_host_workers_flag(parser)
    args, _ = parser.parse_known_args(argv)
    return args


def main(argv=None):
    opt = parse_args(argv)

    from ..adapters import DenoiserWithMemoryAdapter
    from ..ckpt import load_checkpoint
    from ..data import list_pairs, validation_denoise
    from ..eval import denoise_tiled_hann
    from ..memory import build_memory_bank
    from ..metrics import calculate_psnr, compute_iq_iou
    from ..models.registry import build_model
    from .common import (HostWorkPool, MetricsWriter, make_metrics_finalize,
                         save_png)

    os.makedirs(opt.save_dir, exist_ok=True)
    clean_imgs, noisy_imgs, clean_paths, noisy_paths = validation_denoise(opt.data_dir)

    clean_all, noise_all = list_pairs(opt.data_dir)
    num_mem = min(opt.num_memory_images, len(clean_all))
    bank = build_memory_bank(
        clean_all[:num_mem], noise_all[:num_mem],
        patch_size=opt.patch_size, stride=opt.memory_stride,
        bank_dtype=opt.bank_dtype,
        clean_dtype=opt.clean_bank_dtype,
        pad_to=512 if opt.pallas_retrieval else 0,
    )

    mesh = None
    retrieval_fn = None
    tile_batch = opt.tile_batch
    if opt.parallel or opt.bank_sharded:
        from ..parallel import make_mesh

        mesh = make_mesh()
        if tile_batch < 0:
            tile_batch = 0  # sharding needs the whole tile batch in one forward
        print(f"tile-parallel over {mesh.devices.size} devices")
    if opt.bank_sharded:
        from ..memory import make_ring_retrieval, shard_bank

        bank = shard_bank(bank, mesh, "data")
        retrieval_fn = make_ring_retrieval(mesh, "data", queries_sharded=True)
        print(f"memory bank sharded over {mesh.devices.size} devices "
              f"(~{bank.noise_flat.nbytes // mesh.devices.size / 1e6:.1f} MB "
              f"noise bank per device)")

    from .common import resolve_dtype

    base = build_model(opt.arch, opt.n_channel, opt.n_feature,
                       dtype=resolve_dtype(getattr(opt, "dtype", None)))
    wrapper = DenoiserWithMemoryAdapter(
        base=base, in_channels=opt.n_channel,
        hidden_channels=opt.adapter_hidden, variant=opt.adapter_variant,
        pallas_retrieval=opt.pallas_retrieval,
        retrieval_fn=retrieval_fn,
    )
    base_params = load_checkpoint(opt.base_ckpt, arch=opt.arch)
    adapter_params = load_checkpoint(opt.adapter_ckpt, arch=opt.adapter_variant)
    params = {"base": base_params, "adapter": adapter_params}
    print(f"Loaded base from {opt.base_ckpt}; adapter from {opt.adapter_ckpt}")

    # Hoisted retrieval (default): one bank pass for the whole tile stack in
    # 128-query chunks, retrieved patches ride along as extra channels so the
    # conv forward keeps its own chunk size without re-sweeping the bank
    # (adapters.batched_select_memory_patch). The ring path retrieves inside
    # the forward by construction (queries sharded with the tiles).
    hoist = bool(getattr(opt, "hoist_retrieval", True)) and retrieval_fn is None
    if hoist:
        import jax.numpy as jnp

        from ..adapters import batched_select_memory_patch

        c = opt.n_channel
        # 0 = one pass over the whole stack (bank sweeps are bound per pass,
        # not per query row — PERF §7.2); >0 = fixed-size query chunks
        if opt.retrieval_chunk < 0:
            raise SystemExit(
                f"--retrieval_chunk must be >= 0 (0 = single pass), got "
                f"{opt.retrieval_chunk}")
        r_chunk = opt.retrieval_chunk if opt.retrieval_chunk > 0 else 10 ** 9

        def pre_tile_fn(tiles, params, bank_noise, bank_clean, bank_norms):
            mem = batched_select_memory_patch(
                tiles, bank_noise, bank_clean, bank_norms,
                use_pallas=opt.pallas_retrieval, chunk=r_chunk,
            )
            return jnp.concatenate([tiles, mem.astype(tiles.dtype)], axis=-1)

        def model_call(stack, params, bank_noise, bank_clean, bank_norms):
            return wrapper.apply(
                {"params": params}, stack[..., :c], bank_noise, bank_clean,
                bank_norms, mem_clean=stack[..., c:],
            )
    else:
        pre_tile_fn = None

        def model_call(tiles, params, bank_noise, bank_clean, bank_norms):
            return wrapper.apply(
                {"params": params}, tiles, bank_noise, bank_clean, bank_norms
            )

    # --frame_burst: N same-shape frames per dispatch through the Hann frames
    # runner, up to three bursts in flight so H2D/D2H overlap compute (the
    # fix for E6 running at half the pyramid engine's throughput — VERDICT
    # r2 weak #3). Lazy stream: the metrics loop pulls drained frames on
    # demand so host-side PSNR/IoU/PNG work overlaps in-flight device bursts.
    pred_cache: dict = {}
    burst_stream = None
    device_metrics = bool(getattr(opt, "device_metrics", False))
    save_mode = getattr(opt, "save_images", "denoised")
    # --device_metrics needs device-resident predictions → burst pipeline
    fetch_pred = (not device_metrics) or save_mode != "none"
    if (opt.frame_burst and opt.frame_burst > 1) or device_metrics:
        from ..eval import make_tiled_hann_runner_frames

        fb = max(int(opt.frame_burst or 0), 1)
        extra = (params, bank.noise_flat, bank.clean, bank.sq_norms)

        def _squeeze2d(a):
            if a.ndim == 3:
                assert a.shape[-1] == 1, (
                    f"memory tiled eval is single-channel: got shape {a.shape}"
                )
                return a[..., 0]
            return a

        by_shape: dict = {}
        for j, nz in enumerate(noisy_imgs):
            shape = np.shape(nz)
            if len(shape) == 3 and shape[2] == 1:
                shape = shape[:2]
            assert len(shape) == 2, (
                f"memory tiled eval is single-channel: frame {j} has shape "
                f"{np.shape(nz)}"
            )
            if device_metrics:
                cshape = np.shape(_squeeze2d(np.asarray(clean_imgs[j])))
                assert cshape == shape, (
                    f"--device_metrics scores on device per shape bucket: "
                    f"clean/noisy shapes differ for frame {j} "
                    f"({cshape} vs {shape})"
                )
            by_shape.setdefault(shape, []).append(j)

        from .common import drain_burst, iter_bursts, make_clean_post

        metrics_fn = None
        if device_metrics:
            # E6 reports PSNR (+ optional IQ-IoU) only: ssim=False keeps the
            # unused 11x11 gaussian pass out of the compiled program
            from ..metrics import make_device_metrics

            metrics_fn = make_device_metrics(
                iq_iou=opt.compute_iq_iou,
                low_q=opt.iq_low_q, high_q=opt.iq_high_q, ssim=False,
            )

        def _get_frame(j):  # (h,w,1) frames squeeze to the bucket shape
            return _squeeze2d(np.asarray(noisy_imgs[j], np.uint8))

        def make_runner(h, w):
            return make_tiled_hann_runner_frames(
                model_call, fb, h, w, ps=opt.patch_size,
                overlap=opt.overlap, batch=tile_batch,
                out_dtype="uint8_round", mesh=mesh, pre_tile_fn=pre_tile_fn,
            )

        post = None
        if metrics_fn is not None:
            # score the still-device-resident [F,H,W] burst vs its clean frames
            post = make_clean_post(
                lambda j: _squeeze2d(np.asarray(clean_imgs[j], np.uint8)),
                fb, metrics_fn,
            )

        burst_stream = iter_bursts(by_shape, _get_frame, fb, make_runner,
                                   extra=extra, post=post)

    import time

    t_start = time.perf_counter()
    drain_log: list = []  # [{"t": s_since_start, "frames": [...]}]

    writer = MetricsWriter()

    def _host_pass(i, noisy_name, clean255, pred255, dev_m):
        """One frame's host pass (PNG + host metrics) — inline by default,
        pooled under --host_workers, finalized in frame order."""
        if save_mode != "none":
            save_png(pred255,
                     os.path.join(opt.save_dir, f"{noisy_name}_denoised_mem.png"),
                     mode="L")

        ious = None
        if dev_m is not None:
            psnr = float(dev_m[0])  # ssim=False scorer: (psnr,) or (psnr, ious)
            if not np.isfinite(psnr):
                psnr = 99.0  # the host path's mse==0 guard (finetune.py:165-173)
            if len(dev_m) > 1:
                ious = [float(v) for v in dev_m[1]]
        else:
            psnr = calculate_psnr(pred255, clean255)
        msg = f"[{i + 1}/{len(clean_imgs)}] {noisy_name} -> PSNR: {psnr:.2f}"
        if opt.compute_iq_iou:
            if ious is None:
                ious = compute_iq_iou(pred255, clean255, opt.iq_low_q, opt.iq_high_q)
            msg += f", IoU(d/m/b)=({ious[0]:.3f},{ious[1]:.3f},{ious[2]:.3f})"
        return msg, dict(psnr=psnr, ious=ious)

    with HostWorkPool(getattr(opt, "host_workers", 0),
                      make_metrics_finalize(writer)) as pool:
        for i, (clean, noisy) in enumerate(zip(clean_imgs, noisy_imgs)):
            noisy_name = os.path.basename(noisy_paths[i]).split(".")[0]
            clean255 = np.asarray(clean).astype(np.uint8)

            dev_m = None
            if burst_stream is not None:
                while i not in pred_cache:
                    chunk = drain_burst(next(burst_stream), pred_cache,
                                        fetch_pred)
                    drain_log.append({
                        "t": round(time.perf_counter() - t_start, 4),
                        "frames": list(chunk),
                    })
                pred255, dev_m = pred_cache.pop(i)
            else:
                # uint8 quantization (reference: clip(p·255 + 0.5)) fused on device
                pred255 = denoise_tiled_hann(
                    model_call, np.asarray(noisy), ps=opt.patch_size,
                    overlap=opt.overlap, batch=tile_batch,
                    extra=(params, bank.noise_flat, bank.clean, bank.sq_norms),
                    out_dtype="uint8_round", mesh=mesh, pre_tile_fn=pre_tile_fn,
                ).squeeze(-1)

            pool.submit(_host_pass, i, noisy_name, clean255, pred255, dev_m)

    if opt.timing_json and drain_log:
        import json

        px = int(np.shape(noisy_imgs[0])[0]) * int(np.shape(noisy_imgs[0])[1])
        with open(opt.timing_json, "w") as f:
            json.dump({"px_per_frame": px, "drains": drain_log}, f)

    writer.write(opt.save_dir)
    avg = writer.averages()
    print(f"Average PSNR: {avg['psnr']:.2f}")
    if opt.compute_iq_iou and "iou_dark" in avg:
        print(
            "Average IQ-3class IoU - "
            f"dark: {avg['iou_dark']:.4f}, mid: {avg['iou_mid']:.4f}, "
            f"bright: {avg['iou_bright']:.4f}"
        )
    return avg


if __name__ == "__main__":
    main()
