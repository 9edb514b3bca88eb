"""Pure-inference tiled denoising CLI — the production serving entry point.

Extension beyond the reference: every reference tiled pipeline
(``evaluation_704*.py``) loads paired ``clean/`` + ``noise/`` directories
because it computes metrics; there is no way to denoise NEW frames with the
production tiled geometry. This CLI runs the same pyramid-blend pipeline
(352-px tiles, 64-px overlap, one fused device program per frame burst —
geometry ``evaluation_704.py:57-115``) over a flat directory of noisy
frames and writes denoised PNGs, nothing else.

Defaults are the TPU production preset (``scripts/eval_704_tpu_fast.sh``):
bf16 compute, 8-frame bursts with up to three in flight, sublane-filling
8-tile scan chunks — docs/PERF.md §3. ``--dtype float32 --tile_batch -1``
reproduces the reference-exact numerics; ``--rounding floor`` (default)
matches ``evaluation_704.py``'s ``clip(p·255)`` uint8 convention
byte-for-byte, ``round`` applies the +0.5 convention of ``evaluation.py:83``.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, required=True,
                        help="directory of noisy frames (every image in it "
                             "is denoised; grayscale, like the SEM data)")
    parser.add_argument("--save_dir", type=str, default="./denoised")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--n_feature", type=int, default=48)
    parser.add_argument("--n_channel", type=int, default=1)
    parser.add_argument("--log_name", type=str, default="UNetImproved")
    parser.add_argument("--arch", type=str, default=None)
    parser.add_argument("--parallel", action="store_true",
                        help="shard the tile batch over all devices in the mesh")
    parser.add_argument("--tile", type=int, default=352)
    parser.add_argument("--overlap", type=int, default=64)
    parser.add_argument("--tile_batch", type=int, default=-8,
                        help="-8 = sublane-filling lax.map chunks (fastest); "
                             "0 = all tiles in one batch; -1 = per-tile scan")
    parser.add_argument("--frame_burst", type=int, default=8,
                        help="frames per device dispatch (0/1 = one at a time)")
    parser.add_argument("--rounding", type=str, default="floor",
                        choices=["floor", "round"],
                        help="uint8 quantization: floor = evaluation_704's "
                             "clip(p*255); round = evaluation.py's +0.5")
    parser.add_argument("--suffix", type=str, default="_denoised")
    from .common import (add_blindspot_flag, add_dtype_flag,
                         add_host_workers_flag)

    add_blindspot_flag(parser)

    add_dtype_flag(parser, default="bfloat16")
    add_host_workers_flag(parser)
    return parser.parse_args(argv)


def run(opt):
    from ..data import load_image_f32
    from ..eval import denoise_tiled_pyramid
    from .common import (HostWorkPool, build_network, jitted_apply,
                         load_params, resolve_dtype, save_png)

    os.makedirs(opt.save_dir, exist_ok=True)
    paths = sorted(
        p for p in glob.glob(os.path.join(opt.input_dir, "*"))
        if os.path.isfile(p)
    )
    if not paths:
        raise SystemExit(f"no frames found in {opt.input_dir}")

    network = build_network(opt.arch, opt.log_name, opt.n_channel,
                            opt.n_feature, dtype=resolve_dtype(opt.dtype),
                            blindspot=getattr(opt, "blindspot", False))
    params = load_params(opt.checkpoint, network)
    fwd = jitted_apply(network, params)
    print(f"Loaded checkpoint from {opt.checkpoint}; "
          f"denoising {len(paths)} frames from {opt.input_dir}")

    mesh = None
    tile_batch = opt.tile_batch
    if opt.parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()
        if tile_batch < 0:
            tile_batch = 0
        print(f"tile-parallel over {mesh.devices.size} devices")

    out_dtype = "uint8_floor" if opt.rounding == "floor" else "uint8_round"

    # collision-safe output names: two inputs with the same stem but
    # different extensions (frame01.png + frame01.tif — the '*' glob picks
    # up every file) must not overwrite each other's denoised PNG
    stem_count: dict = {}
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        stem_count[stem] = stem_count.get(stem, 0) + 1

    def out_path(p):
        base = os.path.basename(p)
        stem, _ = os.path.splitext(base)
        if stem_count[stem] > 1:  # keep the extension in the name
            stem = base.replace(".", "_")
        return os.path.join(opt.save_dir, f"{stem}{opt.suffix}.png")

    def _load(j):
        arr = load_image_f32(paths[j])
        assert arr.ndim == 2, (
            f"tiled pyramid denoising is single-channel: {paths[j]} has "
            f"shape {arr.shape}"
        )
        return arr.astype(np.uint8)

    n_done = 0

    def _finalize(name):
        nonlocal n_done
        n_done += 1
        print(f"[{n_done}/{len(paths)}] {name}")

    def _encode(frame, path):
        save_png(frame, out_path(path), mode=None)
        return os.path.basename(path)

    # --host_workers: PNG encode (PIL releases the GIL in zlib) runs in a
    # thread pool; progress lines still print in frame order
    with HostWorkPool(getattr(opt, "host_workers", 0), _finalize) as pool:
        _run_frames(opt, paths, pool, _encode, _load, fwd, tile_batch,
                    out_dtype, mesh)

    print(f"Wrote {n_done} denoised frames to {opt.save_dir}")
    return n_done


def _run_frames(opt, paths, pool, _encode, _load, fwd, tile_batch,
                out_dtype, mesh):
    from ..eval import denoise_tiled_pyramid

    if opt.frame_burst and opt.frame_burst > 1:
        from PIL import Image

        from ..eval.tiled import make_tiled_pyramid_runner_frames
        from .common import iter_bursts

        fb = opt.frame_burst
        # header-only pass for shape bucketing (PIL reads sizes lazily);
        # frames decode on demand inside the burst stream, so peak host RAM
        # is bounded by the <=3 in-flight bursts, not the directory size
        by_shape: dict = {}
        for j, p in enumerate(paths):
            with Image.open(p) as im:
                w_px, h_px = im.size
            by_shape.setdefault((h_px, w_px), []).append(j)

        def make_runner(h, w):
            return make_tiled_pyramid_runner_frames(
                fwd, fb, h, w, opt.tile, opt.overlap, batch=tile_batch,
                out_dtype=out_dtype, mesh=mesh,
            )

        # lazy burst stream (same discipline as evaluation_704): PNG encode
        # for finished frames overlaps device work on in-flight bursts
        for chunk, (out_dev, _l1), _ in iter_bursts(by_shape, _load, fb,
                                                    make_runner):
            out = np.asarray(out_dev)
            for k, j in enumerate(chunk):
                pool.submit(_encode, out[k], paths[j])
    else:
        for j, p in enumerate(paths):
            pred255, _l1 = denoise_tiled_pyramid(
                fwd, _load(j), ps=opt.tile, overlap=opt.overlap,
                batch=tile_batch, out_dtype=out_dtype, mesh=mesh,
            )
            pool.submit(_encode, pred255, p)


def main(argv=None):
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
