"""TPU bench experiments: single-frame vs frame-burst, f32 vs bf16.

Measures the reference production inference geometry (ImprovedUNet-48,
704x704 frames, 352-px tiles, 64-px overlap, pyramid blend) in several
pipeline configurations to pick bench.py's shape. Each config is a separate
compiled program; on this remote-compile backend every compile is minutes,
so run this in the background with a generous timeout.

Usage: python scripts/bench_experiments.py [config ...]
Configs: single_f32 burst4_f32 burst4_bf16 burst8_bf16 single_bf16
(default: all). One JSON line per config on stdout.
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

from image_denoising_tpu.eval.tiled import (
    make_tiled_pyramid_runner,
    make_tiled_pyramid_runner_frames,
)
from image_denoising_tpu.models import ImprovedUNet

H = W = 704
PS, OVERLAP = 352, 64
N_FRAMES = 12  # total frames measured per config


def build(dtype):
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dtype)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    return fwd


def measure(name: str):
    dtype = jnp.bfloat16 if name.endswith("bf16") else None
    fwd = build(dtype)
    burst = 1
    if name.startswith("burst"):
        burst = int(name.split("_")[0][len("burst"):])

    if burst == 1:
        run = make_tiled_pyramid_runner(
            fwd, H, W, PS, OVERLAP, batch=-1, out_dtype="uint8_floor"
        )
        mk = lambda fr: jnp.asarray(fr)
    else:
        run = make_tiled_pyramid_runner_frames(
            fwd, burst, H, W, PS, OVERLAP, batch=-1, out_dtype="uint8_floor"
        )
        mk = lambda fr: jnp.asarray(fr)

    rng = np.random.default_rng(0)
    if burst == 1:
        inputs = [rng.integers(0, 256, (H, W)).astype(np.uint8)
                  for _ in range(N_FRAMES)]
    else:
        n_bursts = max(N_FRAMES // burst, 1)
        inputs = [rng.integers(0, 256, (burst, H, W)).astype(np.uint8)
                  for _ in range(n_bursts)]

    t0 = time.perf_counter()
    np.asarray(run(mk(inputs[0]))[0])  # warmup: compile + full fetch
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [run(mk(inp))[0] for inp in inputs]  # async issue
    host = [np.asarray(o) for o in outs]        # real D2H fetch of everything
    dt = time.perf_counter() - t0
    assert all(hh.dtype == np.uint8 for hh in host)
    n_done = len(inputs) * burst if burst > 1 else len(inputs)
    mps = n_done * H * W / 1e6 / dt

    flops = None
    try:
        lowered = run.lower(mk(inputs[0]))
        cost = lowered.compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception as e:  # cost analysis is best-effort on this backend
        flops = f"err:{type(e).__name__}"

    print(json.dumps({
        "config": name, "mps": round(mps, 3), "compile_s": round(compile_s, 1),
        "frames": n_done, "wall_s": round(dt, 3), "program_flops": flops,
    }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or [
        "single_f32", "burst4_f32", "burst4_bf16", "burst8_bf16"
    ]
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    for n in names:
        measure(n)
