"""Round-3 TPU experiment: train-loop metric-fetch pipelining.

The trainer CLIs fetch each step's loss to the host before dispatching the
next step (reference train.py:369-373 prints per-iteration). On the tunneled
backend a synchronous fetch costs a device round trip that serializes host
batch prep against device compute. This measures the fused structure step
(bench geometry: batch 4x352^2, remat, f32) under three fetch disciplines:

  sync   — dispatch step i, fetch loss i          (round-2 loop & bench.py)
  lag1   — dispatch step i, fetch loss i-1        (cli/train.py round 3)
  endfetch — dispatch all, fetch all at the end   (upper bound)

Each variant feeds FRESH uint8 numpy batches per step (realistic H2D), and
every loss is fetched by the end (block_until_ready alone returns early on
this backend — CLAUDE.md).

Run: python scripts/bench_experiments6.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from image_denoising_tpu.models import ImprovedUNet
from image_denoising_tpu.train import create_train_state, make_structure_train_step

PS = 352
N_STEPS = 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, remat=True)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    step = make_structure_train_step(model.apply)

    rng = np.random.default_rng(0)

    def fresh_batch():
        return (
            rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8),
            rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8),
        )

    state = create_train_state(params, lr=3e-4)
    t0 = time.perf_counter()
    state, m = step(state, *fresh_batch())
    float(m["loss"])
    emit(kind="compile", seconds=round(time.perf_counter() - t0, 1))

    for name in ("sync", "lag1", "endfetch", "sync", "lag1"):
        t0 = time.perf_counter()
        if name == "sync":
            for _ in range(N_STEPS):
                state, m = step(state, *fresh_batch())
                loss = float(m["loss"])
        elif name == "lag1":
            pending = None
            for _ in range(N_STEPS):
                state, m = step(state, *fresh_batch())
                if pending is not None:
                    loss = float(pending["loss"])
                pending = m
            loss = float(pending["loss"])
        else:
            ms = []
            for _ in range(N_STEPS):
                state, m = step(state, *fresh_batch())
                ms.append(m)
            losses = [float(m["loss"]) for m in ms]
            loss = losses[-1]
        dt = time.perf_counter() - t0
        assert np.isfinite(loss)
        emit(kind="train_fetch", mode=name, s_per_step=round(dt / N_STEPS, 4),
             total_s=round(dt, 2))


if __name__ == "__main__":
    main()
