"""TPU bench experiments, part 4: sublane alignment elsewhere.

Part-3 found batch 8 (the sublane count) avoids XLA's space-to-batch conv
rewrite and its halo traffic. This measures the same effect on:

1. the A-domain train step — reference batch 4 vs sublane-filling batch 8
   (samples/s, not s/step, is the metric that matters for production);
2. the Hann memory eval engine (E6): tile chunk 1 vs 8 with the
   hyper-gated-FFT adapter and a real memory bank, device-resident.

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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_train(batch: int, dtype=None):
    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import create_train_state, make_structure_train_step

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, remat=True, dtype=dtype)
    x0 = jnp.zeros((1, 352, 352, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
    state = create_train_state(params, lr=3e-4)
    step = make_structure_train_step(model.apply)

    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (batch, 352, 352, 1)).astype(np.uint8)
    noisy = rng.integers(0, 256, (batch, 352, 352, 1)).astype(np.uint8)

    t0 = time.perf_counter()
    state, m = step(state, clean, noisy)
    _ = float(m["loss"])
    compile_s = time.perf_counter() - t0

    n_steps = 6
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step(state, clean, noisy)
        loss = float(m["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    emit(kind="train", batch=batch,
         dtype="bf16" if dtype is not None else "f32",
         s_per_step=round(dt / n_steps, 4),
         samples_per_s=round(batch * n_steps / dt, 2),
         compile_s=round(compile_s, 1))


def bench_memory_eval(chunk: int):
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.eval.tiled import make_tiled_hann_runner
    from image_denoising_tpu.memory import MemoryBank
    from image_denoising_tpu.models import ImprovedUNet

    h = w = 704
    ps, overlap = 128, 64
    rng = np.random.default_rng(0)

    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=jnp.bfloat16)
    wrapper = DenoiserWithMemoryAdapter(
        base=base, in_channels=1, hidden_channels=16, variant="hyper_gated_fft"
    )

    n_bank = 4096  # modest bank so the model dominates, like eval-time E6
    bank_noise = rng.random((n_bank, ps * ps), dtype=np.float32)
    bank = MemoryBank(
        noise_flat=jnp.asarray(bank_noise),
        clean=jnp.asarray(rng.random((n_bank, ps, ps, 1), dtype=np.float32)),
        sq_norms=jnp.sum(jnp.asarray(bank_noise) ** 2, axis=1),
        patch_size=ps,
        stride=4,
    )

    tiles0 = jnp.zeros((1, ps, ps, 1), jnp.float32)
    params = jax.jit(wrapper.init)(
        jax.random.PRNGKey(1), tiles0, bank.noise_flat, bank.clean, bank.sq_norms
    )["params"]

    def mem_call(tiles, p, bn, bc, bs):
        return wrapper.apply({"params": p}, tiles, bn, bc, bs)

    run = make_tiled_hann_runner(mem_call, h, w, ps=ps, overlap=overlap,
                                 batch=-chunk, out_dtype="uint8_round")

    @jax.jit
    def pipe(seed, p, bn, bc, bs):
        # bank passed as runtime args, NOT closed over — closure constants
        # would embed the multi-100MB bank into the serialized program
        frame = jax.random.randint(
            jax.random.PRNGKey(seed), (h, w), 0, 256, jnp.int32
        ).astype(jnp.uint8)
        return run(frame, p, bn, bc, bs)

    args = (params, bank.noise_flat, bank.clean, bank.sq_norms)
    t0 = time.perf_counter()
    np.asarray(pipe(0, *args))
    compile_s = time.perf_counter() - t0

    n = 6
    t0 = time.perf_counter()
    outs = [pipe(i + 1, *args) for i in range(n)]
    _ = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    emit(kind="memory_eval", chunk=chunk, mps=round(n * h * w / 1e6 / dt, 3),
         ms_per_frame=round(1e3 * dt / n, 1), compile_s=round(compile_s, 1))


if __name__ == "__main__":
    which = sys.argv[1:] or ["train4", "train8", "mem1", "mem8"]
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    for wname in which:
        if wname.startswith("train"):
            bench_train(int(wname[len("train"):]))
        elif wname.startswith("mem"):
            bench_memory_eval(int(wname[len("mem"):]))
