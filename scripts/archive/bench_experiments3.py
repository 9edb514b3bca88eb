"""TPU bench experiments, part 3: device-compute deep dive.

Part-2 finding: the device itself sustains only ~5.4 MP/s (bf16) on the
tiled-352 workload with the tile-by-tile lax.map scan — the tunnel adds
~85 ms/fetch latency but is not the main term. This sweep isolates the tile
batch size inside the lax.map body (1 vs 3 vs 9 tiles per iteration) on
device-resident data, and attempts a jax.profiler trace of the hot program.

One JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

H = W = 704
PS, OVERLAP = 352, 64
BURST = int(os.environ.get("BURST", "4"))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def build_pipeline(dtype, batch):
    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames
    from image_denoising_tpu.models import ImprovedUNet

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dtype)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    run = make_tiled_pyramid_runner_frames(
        fwd, BURST, H, W, PS, OVERLAP, batch=batch, out_dtype="uint8_floor"
    )

    @jax.jit
    def device_pipeline(seed):
        frames = jax.random.randint(
            jax.random.PRNGKey(seed), (BURST, H, W), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        pred, _ = run(frames)
        return jnp.sum(pred.astype(jnp.int32), axis=(1, 2))

    return device_pipeline


def sweep(name: str, batch: int):
    dtype = jnp.bfloat16 if name.endswith("bf16") else None
    pipe = build_pipeline(dtype, batch)
    t0 = time.perf_counter()
    np.asarray(pipe(0))
    compile_s = time.perf_counter() - t0

    n_bursts = 6
    t0 = time.perf_counter()
    outs = [pipe(i + 1) for i in range(n_bursts)]
    _ = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    mps = n_bursts * BURST * H * W / 1e6 / dt
    emit(kind="chunk_sweep", config=name, chunk=-batch if batch < 0 else batch,
         mps=round(mps, 3), compile_s=round(compile_s, 1),
         ms_per_frame=round(1e3 * dt / (n_bursts * BURST), 1))
    return pipe


def try_profile(pipe, outdir):
    try:
        os.makedirs(outdir, exist_ok=True)
        with jax.profiler.trace(outdir):
            np.asarray(pipe(99))
        files = []
        for root, _, fs in os.walk(outdir):
            files += [os.path.join(root, f) for f in fs]
        emit(kind="profile", ok=True, outdir=outdir, n_files=len(files),
             files=[os.path.relpath(f, outdir) for f in files[:10]])
    except Exception as e:
        emit(kind="profile", ok=False, error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    names = sys.argv[1:] or ["chunk1_bf16", "chunk3_bf16", "chunk9_bf16"]
    profile_dir = os.environ.get("PROFILE_DIR", "/tmp/profile_tiled_eval")
    last = None
    for name in names:
        k = int(name.split("_")[0][len("chunk"):])
        last = sweep(name, -k)
    if os.environ.get("PROFILE", "1") != "0" and last is not None:
        try_profile(last, profile_dir)
