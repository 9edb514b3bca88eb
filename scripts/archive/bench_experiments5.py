"""Round-3 TPU experiment: frame-burst memory (E6/Hann) eval throughput.

Measures make_tiled_hann_runner_frames — N same-shape 704^2 frames per
device dispatch through the Hann memory engine (hyper-gated-FFT adapter,
4096-patch bank, chunk -8 tile scan) — against the single-frame runner's
round-2 number (4.53 MP/s device). VERDICT round-2 item 3 target: >= 6 MP/s.

Run (background; remote compiles take minutes):
    python scripts/bench_experiments5.py memb4 memb8 | tee /tmp/bench_exp5_r3.log
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_memory_eval_burst(burst: int, chunk: int = 8):
    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.eval.tiled import make_tiled_hann_runner_frames
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

    run = make_tiled_hann_runner_frames(
        mem_call, burst, h, w, ps=ps, overlap=overlap, batch=-chunk,
        out_dtype="uint8_round",
    )

    @jax.jit
    def make_frames(seed):
        return jax.random.randint(
            jax.random.PRNGKey(seed), (burst, h, w), 0, 256, jnp.int32
        ).astype(jnp.uint8)

    args = (params, bank.noise_flat, bank.clean, bank.sq_norms)
    t0 = time.perf_counter()
    np.asarray(run(make_frames(0), *args))  # compile + full D2H
    compile_s = time.perf_counter() - t0

    n_bursts = max(1, 16 // burst)
    t0 = time.perf_counter()
    outs = [run(make_frames(i + 1), *args) for i in range(n_bursts)]
    _ = [np.asarray(o) for o in outs]  # real D2H of every frame (uint8)
    dt = time.perf_counter() - t0
    n = n_bursts * burst
    emit(kind="memory_eval_burst", burst=burst, chunk=chunk,
         mps=round(n * h * w / 1e6 / dt, 3),
         ms_per_frame=round(1e3 * dt / n, 1), compile_s=round(compile_s, 1))


if __name__ == "__main__":
    which = sys.argv[1:] or ["memb4", "memb8"]
    emit(kind="env", devices=[str(d) for d in jax.devices()])
    for wname in which:
        if wname.startswith("memb"):
            spec = wname[len("memb"):]
            if "c" in spec:  # e.g. memb4c16 = burst 4, tile chunk 16
                b, c = spec.split("c")
                bench_memory_eval_burst(int(b), chunk=int(c))
            else:
                bench_memory_eval_burst(int(spec))
