"""Round-3 TPU experiment: bf16 compute on the fused+pipelined train step.

PERF §6 pins the f32 fused batch-8 train step at 0.264 s/step with lag-1
metric fetching (the pipelined bound). The `--dtype bfloat16` trainer path
(params f32, compute bf16) was last measured in round 2 on the UNFUSED
two-forward step (0.55 s/step). This measures the current default — fused
batch-8 forward + remat + lag-1 fetch — in both dtypes back-to-back so the
bf16 speedup on the production train geometry is on record.

Run: python scripts/bench_experiments7.py   (real TPU; ~2 compiles)
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


def run(dtype):
    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, remat=True,
                         dtype=dtype)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    step = make_structure_train_step(model.apply)

    rng = np.random.default_rng(0)

    def fresh_batch():
        return (
            rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8),
            rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8),
        )

    name = np.dtype(dtype).name
    state = create_train_state(params, lr=3e-4)
    t0 = time.perf_counter()
    state, m = step(state, *fresh_batch())
    loss0 = float(m["loss"])
    emit(kind="compile", dtype=name,
         seconds=round(time.perf_counter() - t0, 1), first_loss=round(loss0, 5))

    for rep in range(2):
        t0 = time.perf_counter()
        pending = None
        for _ in range(N_STEPS):
            state, m = step(state, *fresh_batch())
            if pending is not None:
                loss = float(pending["loss"])
            pending = m
        loss = float(pending["loss"])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss)
        emit(kind="train_step", dtype=name, rep=rep,
             s_per_step=round(dt / N_STEPS, 4), loss=round(loss, 5))


def main():
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    run(jnp.float32)
    run(jnp.bfloat16)


if __name__ == "__main__":
    main()
