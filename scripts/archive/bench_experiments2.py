"""TPU bench experiments, part 2: prove where the end-to-end ceiling is.

Part-1 finding (scripts/bench_experiments.py): every pipeline config lands at
~9-10 MB/s of uint8 frames through the tunnel, suggesting the end-to-end
tiled-eval bench is transport-bandwidth-bound, not compute-bound. This script
measures:

1. raw H2D / D2H bandwidth of frame-sized buffers (the transport ceiling),
2. device-resident denoise throughput: frames are generated ON DEVICE from a
   PRNG seed, the burst tiled-pyramid program runs, and only a per-frame
   checksum (sum of the uint8 output) is fetched — forcing every output byte
   to be computed while shipping ~nothing, i.e. pure device throughput,
3. the A-domain train step (reference geometry: ImprovedUNet-48, batch 4,
   352², remat, Structure loss) s/step through a real metric fetch.

One JSON line per measurement on stdout.
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_transport():
    dev = jax.devices()[0]
    for mb in (0.5, 2.0, 8.0):
        n = int(mb * 1e6)
        buf = np.random.default_rng(0).integers(0, 256, n).astype(np.uint8)
        # H2D
        t0 = time.perf_counter()
        reps = 6
        devbufs = []
        for _ in range(reps):
            devbufs.append(jax.block_until_ready(jax.device_put(buf, dev)))
        h2d = time.perf_counter() - t0
        # D2H (force real fetch via np.asarray)
        t0 = time.perf_counter()
        for db in devbufs:
            np.asarray(db)
        d2h = time.perf_counter() - t0
        emit(kind="transport", size_mb=mb,
             h2d_mbps=round(reps * mb / h2d, 2),
             d2h_mbps=round(reps * mb / d2h, 2))


def _build_fwd(dtype):
    from image_denoising_tpu.models import ImprovedUNet

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dtype)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    return fwd


def bench_device_resident(name: str, burst: int):
    """Seed -> on-device frames -> burst denoise -> per-frame checksum."""
    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames

    dtype = jnp.bfloat16 if name.endswith("bf16") else None
    fwd = _build_fwd(dtype)
    run = make_tiled_pyramid_runner_frames(
        fwd, burst, H, W, PS, OVERLAP, batch=-1, out_dtype="uint8_floor"
    )

    @jax.jit
    def device_pipeline(seed):
        frames = jax.random.randint(
            jax.random.PRNGKey(seed), (burst, H, W), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        pred, l1 = run(frames)
        # per-frame checksum: depends on every output byte
        return jnp.sum(pred.astype(jnp.int64), axis=(1, 2)), l1

    t0 = time.perf_counter()
    np.asarray(device_pipeline(0)[0])
    compile_s = time.perf_counter() - t0

    n_bursts = max(int(round(24 / burst)), 2)
    t0 = time.perf_counter()
    outs = [device_pipeline(i + 1) for i in range(n_bursts)]
    sums = [np.asarray(o[0]) for o in outs]
    dt = time.perf_counter() - t0
    assert all(np.all(s > 0) for s in sums)
    mps = n_bursts * burst * H * W / 1e6 / dt
    emit(kind="device_resident", config=name, burst=burst,
         mps=round(mps, 3), compile_s=round(compile_s, 1),
         frames=n_bursts * burst, wall_s=round(dt, 3))


def bench_train_step(name: str):
    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import create_train_state, make_structure_train_step

    dtype = jnp.bfloat16 if name.endswith("bf16") else None
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, remat=True, dtype=dtype)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    state = create_train_state(params, lr=3e-4)
    step = make_structure_train_step(model.apply)

    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8)
    noisy = rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8)

    t0 = time.perf_counter()
    state, m = step(state, clean, noisy)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0

    n_steps = 6
    t0 = time.perf_counter()
    losses = []
    for _ in range(n_steps):
        state, m = step(state, clean, noisy)
        losses.append(m["loss"])
    vals = [float(l) for l in losses]  # real D2H fetch of every step's metric
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals)
    emit(kind="train_step", config=name, s_per_step=round(dt / n_steps, 4),
         compile_s=round(compile_s, 1), steps=n_steps)


if __name__ == "__main__":
    which = sys.argv[1:] or ["transport", "dev_bf16", "dev_f32", "train_f32"]
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    for w in which:
        if w == "transport":
            bench_transport()
        elif w.startswith("dev_"):
            bench_device_resident(w, burst=4)
        elif w.startswith("train"):
            bench_train_step(w)
