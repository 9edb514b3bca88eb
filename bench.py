"""Benchmark: tiled-352 full-frame denoise throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Workload: the reference's production inference geometry — ImprovedUNet
(n_feature=48, grayscale) denoising 704×704 frames via 352-px tiles with
64-px overlap and pyramid blending (evaluation_704 semantics) — run through
our batched on-device engine. ``vs_baseline`` is the speedup over the
PyTorch-CPU reference measured by scripts/measure_torch_baseline.py
(stored in bench_baseline.json; re-measured live if absent and the reference
checkout is available).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _load_baseline() -> float | None:
    path = os.path.join(REPO, "bench_baseline.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["value"])
    if os.path.isdir("/root/reference"):
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "measure_torch_baseline.py")],
            capture_output=True, text=True,
        )
        if r.returncode == 0 and os.path.exists(path):
            with open(path) as f:
                return float(json.load(f)["value"])
    return None


def main():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner
    from image_denoising_tpu.models import ImprovedUNet

    h = w = 704
    ps, overlap = 352, 64

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48)
    x0 = jnp.zeros((1, ps, ps, 1), jnp.float32)
    # init must be jitted: eager dispatch over a remote TPU transport is slow
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    # batch=-1: lax.map tile scan — compiles the network body once (~2.5 min
    # vs ~15 min for the 9-tile batched program on this backend) AND measures
    # faster (better VMEM locality per tile)
    # uint8_floor output: the evaluation_704 quantization fused on device,
    # shipping 0.5 MB instead of 2 MB per frame over the transport
    run = make_tiled_pyramid_runner(fwd, h, w, ps, overlap, batch=-1,
                                    out_dtype="uint8_floor")

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(4)]

    # warmup (compile or persistent-cache hit)
    jax.block_until_ready(run(jnp.asarray(frames[0])))

    # production-shaped pipeline: per-frame H2D transfer included, frames
    # issued asynchronously (transfers overlap compute). Every output is
    # materialized on the host (np.asarray) — block_until_ready alone has
    # been observed to return early on this tunneled backend, inflating
    # numbers; a D2H fetch cannot lie.
    n_rep = 3
    t0 = time.perf_counter()
    outs = []
    for _ in range(n_rep):
        for fr in frames:
            outs.append(run(jnp.asarray(fr))[0])
    host = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    assert all(hh.dtype == np.uint8 for hh in host)
    mp = n_rep * len(frames) * h * w / 1e6
    mps = mp / dt

    baseline = _load_baseline()
    out = {
        "metric": "tiled352_denoise_throughput",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / baseline, 3) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
