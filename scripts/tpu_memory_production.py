"""Production-scale memory-bounded eval on real TPU.

Runs the E6 CLI (evaluation_704_iqsl_memory) at the reference's PRODUCTION
memory configuration (eval_704_iqsl_memory.sh:34-38): patch 128, overlap 64,
5 memory images, memory stride 4 — on synthetic 704² SEM-like frames. At
stride 4 the bank is ~105k 128² patches (~3.4 GB bf16 noise + 6.9 GB f32
clean), the memory-bounded regime SURVEY.md §5 calls out. Validates that one
v5e chip holds the production bank with `--bank_dtype bfloat16` and streams
it through the Pallas retrieval kernel.

Writes PNGs + metrics under /tmp/mem_prod; prints one JSON line at the end.

Usage: python scripts/tpu_memory_production.py [bank_mode] [frames] [serve]
  bank_mode: "bf16_pallas" (default — bf16 bank + streaming Pallas kernel),
  "int8" (centered int8 bank, exact integer distances, XLA retrieval,
  1.7 GB noise bank), "int8_pallas" (the same exact-int32 bank streamed
  through the Pallas kernel — 4x fewer bank bytes than f32),
  "int8_pallas_u8clean" (int8 noise + LOSSLESS uint8 clean store: the full
  stride-4 regime in ~3.4 GB instead of 10.3 GB), or
  "f32" (10.3 GB f32 banks, XLA retrieval).
  frames: eval-frame count (default 5; the bank always uses the first 5
  pairs). 40 → ten identical burst-4 dispatches, which is the steady-state
  protocol (see steady_mps below; >= 6 bursts needed for a defined number).
  serve: literal "serve" scores PSNR on-device with no PNG writes
  (--device_metrics --save_images none), so drain gaps measure the DEVICE
  regime rather than the 1-core host's metric/PNG pass.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_dataset(root: str, n: int = 5, hw: int = 704) -> None:
    from PIL import Image

    os.makedirs(os.path.join(root, "clean"), exist_ok=True)
    os.makedirs(os.path.join(root, "noise"), exist_ok=True)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:hw, 0:hw]
    for i in range(n):
        clean = (
            110
            + 70 * np.sin(xx / 11.0 + 2 * i)
            + 40 * ((yy // 32 + xx // 32) % 2)
        ).clip(0, 255).astype(np.uint8)
        noisy = np.clip(
            clean.astype(np.float32) + rng.normal(0, 14, clean.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(clean).save(f"{root}/clean/sem0000_{i:02d}.png")
        Image.fromarray(noisy).save(f"{root}/noise/sem0000_{i:02d}.png")


MODES = ("bf16_pallas", "int8", "int8_pallas", "int8_pallas_u8clean", "f32",
         "finetune")


def run_finetune_timing(stride: int = 4):
    """T5 memory finetune at the PRODUCTION bank (VERDICT r4 next #4):
    the reference's finetune_memory.py:1395-1453 hot loop — batch-4 128²
    patches, frozen base, hyper-gated-FFT adapter, L1 + λ_grad·grad +
    λ_iqsl·IQSL, retrieval against the full stride-4 bank EVERY step — timed
    on one v5e with the minimum-HBM bank (int8 noise + uint8 clean, Pallas
    streaming). Reports s/step (f32 and bf16 compute, lag-1 fetch) and the
    retrieval-only time at the step's B=4 queries. Both isolated retrieval
    numbers are FLOOR-BOUND by the tunnel's D2H latency on the 262 KB patch
    fetch (~50-90 ms, PERF §1) — for the honest in-step bank-sweep share,
    run this mode again with a large stride (``finetune 32`` → ~1.8k-patch
    bank) and subtract the step times: the step program is identical except
    for the bank sweep."""
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import (DenoiserWithMemoryAdapter,
                                              select_memory_patch)
    from image_denoising_tpu.memory import build_memory_bank
    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import create_train_state
    from image_denoising_tpu.train.finetune_steps import \
        make_memory_finetune_step

    root = "/tmp/mem_prod_data_5"
    make_dataset(root, n=5)
    clean_paths = [f"{root}/clean/sem0000_{i:02d}.png" for i in range(5)]
    noise_paths = [f"{root}/noise/sem0000_{i:02d}.png" for i in range(5)]
    t0 = time.perf_counter()
    bank = build_memory_bank(clean_paths, noise_paths, patch_size=128,
                             stride=stride, bank_dtype="int8",
                             clean_dtype="uint8", pad_to=512)
    # bank_s is informational: dominated by the host patch-extraction pass.
    # Fence with a real D2H fetch of the small sq_norms array plus a
    # best-effort block on the big banks (block_until_ready can return
    # early on this backend — CLAUDE.md — so bank_s may slightly understate
    # the 1.7 GB noise-bank transfer tail).
    np.asarray(bank.sq_norms)
    jax.block_until_ready((bank.noise_flat, bank.clean))
    print(json.dumps({"bank_s": round(time.perf_counter() - t0, 1),
                      "n": bank.size}), flush=True)

    rng = np.random.default_rng(0)
    clean01 = jnp.asarray(rng.random((4, 128, 128, 1), dtype=np.float32))
    # uint8-sourced noisy patches: the int8 retrieval contract
    noisy01 = jnp.asarray(
        (rng.integers(0, 256, (4, 128, 128, 1)) / 255.0).astype(np.float32))

    # retrieval-only at the step's query batch (B=4) — is the step
    # retrieval-dominated?
    retr = jax.jit(lambda q, bn, bc, bs: select_memory_patch(
        q, bn, bc, bs, use_pallas=True))
    np.asarray(retr(noisy01, bank.noise_flat, bank.clean, bank.sq_norms))
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(retr(noisy01, bank.noise_flat, bank.clean, bank.sq_norms))
        ts.append(time.perf_counter() - t)
    retrieval_s = float(np.median(ts))
    # The synchronous number above is dominated by the per-fetch D2H latency
    # (~80-90 ms on this tunnel, PERF §1) — in-step retrieval pays no fetch.
    # Pipelined (lag-1 fetch) dispatch-to-dispatch is the honest per-call
    # cost to compare against the step time.
    n_it = 10
    t0 = time.perf_counter()
    pending = None
    for _ in range(n_it):
        o = retr(noisy01, bank.noise_flat, bank.clean, bank.sq_norms)
        if pending is not None:
            np.asarray(pending)
        pending = o
    np.asarray(pending)
    retrieval_pipe_s = (time.perf_counter() - t0) / n_it
    print(json.dumps({"retrieval_only_b4_s": round(retrieval_s, 4),
                      "retrieval_pipelined_b4_s": round(retrieval_pipe_s, 4)}),
          flush=True)

    bank_gb = (bank.noise_flat.size * bank.noise_flat.dtype.itemsize
               + bank.clean.size * bank.clean.dtype.itemsize
               + bank.sq_norms.size * bank.sq_norms.dtype.itemsize) / 1e9
    out = {"kind": "memory_production_finetune",
           "config": f"patch128/stride{stride}/int8+u8clean/batch4",
           "bank_patches": bank.size,
           "bank_gb": round(bank_gb, 2),
           "retrieval_only_b4_s": round(retrieval_s, 4),
           "retrieval_pipelined_b4_s": round(retrieval_pipe_s, 4)}
    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.bfloat16 if dtype_name == "bfloat16" else None
        base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dt)
        wrapper = DenoiserWithMemoryAdapter(
            base=base, in_channels=1, hidden_channels=16,
            variant="hyper_gated_fft", pallas_retrieval=True)
        tiles0 = jnp.zeros((2, 128, 128, 1), jnp.float32)
        wparams = jax.jit(wrapper.init)(
            jax.random.PRNGKey(0), tiles0, bank.noise_flat, bank.clean,
            bank.sq_norms)["params"]
        base_params = wparams["base"]
        state = create_train_state(wparams["adapter"], lr=1e-4)
        step = make_memory_finetune_step(
            wrapper.apply, lambda_grad=0.1, lambda_iqsl=0.1,
            iqsl_cfg={"t1": 0.3, "t2": 0.7})
        t0 = time.perf_counter()
        state, m = step(state, base_params, clean01, noisy01,
                        bank.noise_flat, bank.clean, bank.sq_norms)
        loss0 = float(m["loss"])
        compile_s = time.perf_counter() - t0
        n_steps = 8
        t0 = time.perf_counter()
        pending = None
        for _ in range(n_steps):
            state, m = step(state, base_params, clean01, noisy01,
                            bank.noise_flat, bank.clean, bank.sq_norms)
            if pending is not None:
                float(pending["loss"])
            pending = m
        loss = float(pending["loss"])
        s_per_step = (time.perf_counter() - t0) / n_steps
        assert np.isfinite(loss)
        rec = {"dtype": dtype_name, "s_per_step": round(s_per_step, 4),
               "compile_s": round(compile_s, 1), "loss0": round(loss0, 5)}
        try:  # HBM occupancy where the backend exposes it
            stats = jax.devices()[0].memory_stats()
            rec["hbm_in_use_gb"] = round(stats["bytes_in_use"] / 1e9, 2)
        except Exception:  # noqa: BLE001 — optional diagnostics
            pass
        print(json.dumps(rec), flush=True)
        out[f"s_per_step_{dtype_name}"] = round(s_per_step, 4)
        if "hbm_in_use_gb" in rec:
            out["hbm_in_use_gb"] = rec["hbm_in_use_gb"]
        del state, step, wparams, base_params
    out["retrieval_share_pct"] = round(
        100.0 * retrieval_pipe_s / out["s_per_step_float32"], 1)
    print(json.dumps(out), flush=True)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16_pallas"
    if mode not in MODES:
        # fail before the fixture/checkpoint prep + TPU-tunnel work
        sys.exit(f"usage: {sys.argv[0]} [{'|'.join(MODES)}] [frames] [serve] "
                 f"(got {mode!r})")
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    serve = len(sys.argv) > 3 and sys.argv[3] == "serve"
    if mode == "finetune":
        # optional second arg: bank stride (default 4 = production; a large
        # stride gives the tiny-bank A/B leg for the in-step retrieval share)
        run_finetune_timing(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
        return

    root = f"/tmp/mem_prod_data_{frames}"
    make_dataset(root, n=frames)

    from image_denoising_tpu.cli import evaluation_704_iqsl_memory as mem_cli

    # base + adapter ckpts from a tiny-geometry wrapper init — this probe is
    # about the production-scale memory machinery, not model quality (and a
    # real 704² training step is a separate, HBM-heavier program)
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter
    from image_denoising_tpu.ckpt import save_checkpoint
    from image_denoising_tpu.models import ImprovedUNet

    small = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48)
    wrapper = DenoiserWithMemoryAdapter(
        base=small, in_channels=1, hidden_channels=16, variant="hyper_gated_fft"
    )
    rngk = np.random.default_rng(0)
    bank_n = jnp.asarray(rngk.random((4, 32 * 32), dtype=np.float32))
    bank_c = jnp.asarray(rngk.random((4, 32, 32, 1), dtype=np.float32))
    sq = jnp.sum(bank_n**2, axis=1)
    tiles = jnp.zeros((1, 32, 32, 1), jnp.float32)
    wparams = jax.jit(wrapper.init)(
        jax.random.PRNGKey(0), tiles, bank_n, bank_c, sq
    )["params"]
    ckpt = save_checkpoint(
        jax.device_get(wparams["base"]), "/tmp/mem_prod_results", "model", 1
    )
    adapter_ckpt = save_checkpoint(
        jax.device_get(wparams["adapter"]), "/tmp/mem_prod_results",
        "adapter_only", 1,
    )

    bank_flags = {
        "bf16_pallas": ["--bank_dtype", "bfloat16", "--pallas_retrieval"],
        "int8": ["--bank_dtype", "int8"],
        "int8_pallas": ["--bank_dtype", "int8", "--pallas_retrieval"],
        # the minimum-HBM production config: int8 noise (exact integer
        # distances) + uint8 clean (lossless byte store) + streaming kernel
        # -> ~3.4 GB total for the stride-4 regime (was 10.3 GB f32)
        "int8_pallas_u8clean": ["--bank_dtype", "int8", "--pallas_retrieval",
                                "--clean_bank_dtype", "uint8"],
        "f32": ["--bank_dtype", "float32"],
    }[mode]

    timing_path = "/tmp/mem_prod_timing.json"
    serve_flags = (
        ["--device_metrics", "--save_images", "none"] if serve else []
    )
    t0 = time.perf_counter()
    avg = mem_cli.main([
        "--data_dir", root,
        "--base_ckpt", ckpt,
        "--adapter_ckpt", adapter_ckpt,
        "--arch", "UNetImproved",
        "--save_dir", "/tmp/mem_prod",
        "--n_feature", "48",
        "--patch_size", "128",
        "--overlap", "64",
        "--num_memory_images", "5",
        "--memory_stride", "4",
        "--dtype", "bfloat16",
        "--frame_burst", "4",  # round-3 burst mode (PERF §7: best at 4)
        "--timing_json", timing_path,
    ] + bank_flags + serve_flags)
    wall = time.perf_counter() - t0

    # steady-state MP/s over drains[SKIP:]: iter_bursts keeps max_inflight=3
    # bursts dispatched ahead, so when drain 1 returns (compile + burst-1
    # exec), bursts 2..3 have ALREADY executed on-device behind it and their
    # drains measure only fetch latency (measured: 0.03 s gaps). Honest
    # device-rate gaps start once that pre-executed backlog is emptied —
    # drop the first SKIP drains and time the rest, which each block on real
    # burst execution. Undefined (None) below 2 post-skip drains.
    steady_mps = None
    SKIP = 3  # = iter_bursts max_inflight
    if os.path.exists(timing_path):
        with open(timing_path) as f:
            timing = json.load(f)
        drains = timing["drains"]
        if len(drains) >= SKIP + 2:
            n_late = sum(len(d["frames"]) for d in drains[SKIP + 1:])
            dt = drains[-1]["t"] - drains[SKIP]["t"]
            if dt > 0:
                steady_mps = round(
                    n_late * timing["px_per_frame"] / 1e6 / dt, 3
                )
    print(json.dumps({
        "kind": "memory_production", "psnr": round(avg.get("psnr", 0), 2),
        "wall_s": round(wall, 1), "frames": frames,
        "steady_mps": steady_mps, "serve": serve,
        "config": f"patch128/overlap64/5imgs/stride4/{mode}/burst4",
    }))


if __name__ == "__main__":
    main()
