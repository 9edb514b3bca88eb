"""Explain (or close) the e2e <-> device-resident gap on the flagship bench
(VERDICT r4 next #7).

BENCH_r04: 7.33 MP/s end-to-end vs 8.19 device-resident — 10.5% "transfer"
gap despite PERF §1's measured near-full overlap. Hypothesis: bench.py's e2e
protocol times only THREE bursts, so the two un-overlappable pipeline edges
(first burst's H2D ~100 ms, last burst's D2H ~90 ms at ~40-50 MB/s for 4 MB)
amortize over 3 bursts ≈ the entire observed 58 ms/burst gap; steady state
has no per-burst transfer cost. Protocols, all on the bench program
(ImprovedUNet-48 bf16, 704² x burst 8, chunk -8, uint8 in/out):

A. device-resident ceiling (pre-staged inputs, fetch-at-end) — 12 bursts
B. e2e, bench.py shape (jnp.asarray per burst, fetch-at-end) — 3 bursts
C. e2e, same, 12 bursts — if the gap shrinks toward A, it was edge
   amortization, not per-burst transfer serialization
D. e2e with a background staging thread keeping 2 bursts device-resident
   ahead of dispatch — separates host-side staging cost from tunnel
   serialization (PjRt multi-thread transfers validated by
   scripts/tpu_host_workers_check.py)
E. raw transfer loop: H2D and D2H of burst-sized uint8 buffers, isolated —
   the edge-cost model inputs

Usage: python scripts/tpu_transfer_gap.py
"""
from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H = W = 704
PS, OVERLAP = 352, 64
BURST = 8


def main():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames
    from image_denoising_tpu.models import ImprovedUNet

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    run = make_tiled_pyramid_runner_frames(
        fwd, BURST, H, W, PS, OVERLAP, batch=-8, out_dtype="uint8_floor")

    rng = np.random.default_rng(0)
    bursts12 = [rng.integers(0, 256, (BURST, H, W)).astype(np.uint8)
                for _ in range(12)]
    np.asarray(run(jnp.asarray(bursts12[0]))[0])  # compile

    def mps(n_frames, dt):
        return round(n_frames * H * W / 1e6 / dt, 3)

    # A. device-resident, 12 bursts
    staged = [jax.device_put(b) for b in bursts12]
    for s in staged:
        np.asarray(s)  # force residency (block_until_ready lies here)
    t0 = time.perf_counter()
    outs = [run(s)[0] for s in staged]
    _ = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    print(json.dumps({"protocol": "A_device_12", "s": round(dt, 3),
                      "mps": mps(12 * BURST, dt)}), flush=True)

    # B. e2e bench shape, 3 bursts
    for reps in (3, 12):
        t0 = time.perf_counter()
        outs = [run(jnp.asarray(b))[0] for b in bursts12[:reps]]
        _ = [np.asarray(o) for o in outs]
        dt = time.perf_counter() - t0
        print(json.dumps({"protocol": f"BC_e2e_{reps}", "s": round(dt, 3),
                          "mps": mps(reps * BURST, dt)}), flush=True)

    # D. e2e with a background staging thread (2 bursts ahead)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def stage():
        for b in bursts12:
            q.put(jax.device_put(b))

    th = threading.Thread(target=stage)
    t0 = time.perf_counter()
    th.start()
    outs = [run(q.get())[0] for _ in range(12)]
    _ = [np.asarray(o) for o in outs]
    dt = time.perf_counter() - t0
    th.join()
    print(json.dumps({"protocol": "D_staged_thread_12", "s": round(dt, 3),
                      "mps": mps(12 * BURST, dt)}), flush=True)

    # E. raw transfer costs at burst size (4 MB uint8 each way)
    buf = bursts12[0]
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        np.asarray(d)  # completion fence
        ts.append(time.perf_counter() - t0)
    h2d = float(np.median(ts))
    dev = jax.device_put(buf)
    np.asarray(dev)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(dev)
        ts.append(time.perf_counter() - t0)
    d2h = float(np.median(ts))
    print(json.dumps({"protocol": "E_raw", "h2d_s": round(h2d, 3),
                      "d2h_s": round(d2h, 3),
                      "mb": round(buf.nbytes / 1e6, 1)}), flush=True)
    print(json.dumps({"kind": "transfer_gap_done"}), flush=True)


if __name__ == "__main__":
    main()
