"""Full-model fused-vs-XLA forward comparison at the bench geometry.

Runs the production eval workload (ImprovedUNet-48 grayscale, 704² frames,
352-px tiles / 64 overlap, 8-frame bursts, chunk-8 tile scan, bf16,
device-resident inputs) through BOTH forwards and prints MP/s for each:

* xla   — the flax apply (the round-2 bench path, 8.48 MP/s device);
* fused — models/fused_forward.py routing the level blocks through the
          VMEM-resident Pallas chain (ops/fused_block_pallas.py).

Usage: python scripts/bench_fused.py [--dtype bfloat16] [--s_rows N]
Each new program shape costs a multi-minute remote compile on this host —
run with generous timeouts.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

H = W = 704
PS, OVERLAP = 352, 64
BURST = 8
TILE_CHUNK = -8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--s_rows", type=int, default=None)
    ap.add_argument("--skip_xla", action="store_true",
                    help="only time the fused path (XLA number known: PERF §3)")
    ap.add_argument("--bursts", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames
    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.models.fused_forward import make_fused_forward

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dt)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    rng = np.random.default_rng(0)
    frames = [jax.device_put(rng.integers(0, 256, (BURST, H, W)).astype(np.uint8))
              for _ in range(args.bursts)]
    for f in frames:
        f.block_until_ready()

    def time_runner(tag, fwd):
        run = make_tiled_pyramid_runner_frames(
            fwd, BURST, H, W, PS, OVERLAP, batch=TILE_CHUNK,
            out_dtype="uint8_floor",
        )
        t0 = time.perf_counter()
        np.asarray(run(frames[0])[0])
        print(f"{tag}: compile+first {time.perf_counter() - t0:.0f}s", flush=True)
        t0 = time.perf_counter()
        outs = [run(f)[0] for f in frames * 2]
        host = [np.asarray(o) for o in outs]
        dtm = time.perf_counter() - t0
        mps = len(outs) * BURST * H * W / 1e6 / dtm
        print(f"{tag}: device {mps:.2f} MP/s  ({dtm / len(outs) * 1e3:.1f} ms/frame-burst-frac)",
              flush=True)
        return mps, host[0]

    fused_fwd_p = make_fused_forward(model, compute_dtype=dt, s_rows=args.s_rows)

    @jax.jit
    def fused_fwd(tiles):
        return fused_fwd_p(params, tiles)

    mps_fused, out_fused = time_runner("fused", fused_fwd)

    if not args.skip_xla:
        @jax.jit
        def xla_fwd(tiles):
            return model.apply({"params": params}, tiles)

        mps_xla, out_xla = time_runner("xla", xla_fwd)
        diff = np.abs(out_fused.astype(np.int16) - out_xla.astype(np.int16))
        print(f"uint8 output max abs diff fused-vs-xla: {diff.max()}", flush=True)
        print(f"speedup: {mps_fused / mps_xla:.2f}x", flush=True)


if __name__ == "__main__":
    main()
