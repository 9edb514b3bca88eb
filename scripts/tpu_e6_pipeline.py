"""Production-bank E6 pipelined steady state (VERDICT r4 next #1).

Round 4 pinned the production memory regime (patch 128 / overlap 64 / 5 imgs
/ stride 4 => 105k-patch bank, int8) at 3.51 MP/s with the SYNCHRONOUS
per-burst protocol (scripts/tpu_hoist_ab.py: dispatch -> full fetch), budget
retrieval 26 ms + transfers ~24 ms + forward ~90 ms per frame. Two levers
remain, both measured here on the int8 + uint8-clean bank:

1. **Single-pass retrieval.** The hoisted retrieval runs a burst's 400
   queries as four 128-query passes, each re-streaming the bank; if the pass
   cost is per-sweep rather than per-MAC (scripts/tpu_retrieval_qbatch_
   sweep.py), one 400-query pass cuts retrieval ~4x. A/B: chunk 128 vs one
   pass, byte-identical outputs required (int8 distances are exact integers,
   chunking-independent).
2. **Dispatch pipelining.** The sync protocol serializes H2D/D2H against
   compute; the CLI's lazy burst stream does not (<=3 bursts in flight).
   Steady state here: dispatch burst i+1, then fetch burst i (lag-1) over K
   fresh uint8 bursts — transfers overlap device compute, the honest
   pipelined rate without the drain-gap artifacts of PERF §7.1.

Prints one JSON line per measurement; the final line carries the headline
pipelined MP/s per config. Reference geometry: evaluation_704_iqsl_memory.py
:1015-1067, eval_704_iqsl_memory.sh:34-38.

Usage: python scripts/tpu_e6_pipeline.py [n_bursts]   (default 8)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H = W = 704
PS, OVERLAP = 128, 64
BURST = 4
N_MEM, STRIDE = 5, 4


def main():
    n_bursts = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from image_denoising_tpu.adapters import (DenoiserWithMemoryAdapter,
                                              batched_select_memory_patch)
    from image_denoising_tpu.eval import make_tiled_hann_runner_frames
    from image_denoising_tpu.memory import build_memory_bank
    from image_denoising_tpu.models import ImprovedUNet

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "n_bursts": n_bursts}), flush=True)

    root = "/tmp/e6_pipeline_data"
    os.makedirs(root + "/clean", exist_ok=True)
    os.makedirs(root + "/noise", exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(N_MEM):
        clean = (120 + 60 * np.sin(xx / 19 + i) + 30 * np.cos(yy / 23)).astype(np.uint8)
        noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255).astype(np.uint8)
        Image.fromarray(clean).save(f"{root}/clean/f{i}.png")
        Image.fromarray(noisy).save(f"{root}/noise/f{i}.png")

    clean_paths = [f"{root}/clean/f{i}.png" for i in range(N_MEM)]
    noise_paths = [f"{root}/noise/f{i}.png" for i in range(N_MEM)]
    t0 = time.perf_counter()
    bank = build_memory_bank(clean_paths, noise_paths, patch_size=PS,
                             stride=STRIDE, bank_dtype="int8",
                             clean_dtype="uint8", pad_to=512)
    # informational timing: real D2H fetch of the small array + best-effort
    # block on the banks (block_until_ready can return early here, CLAUDE.md)
    np.asarray(bank.sq_norms)
    jax.block_until_ready((bank.noise_flat, bank.clean))
    print(json.dumps({"bank_s": round(time.perf_counter() - t0, 1),
                      "n": bank.size,
                      "bank_gb": round((bank.noise_flat.nbytes
                                        + bank.clean.nbytes) / 1e9, 2)}),
          flush=True)

    base = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=jnp.bfloat16)
    wrapper = DenoiserWithMemoryAdapter(base=base, in_channels=1,
                                        hidden_channels=16,
                                        pallas_retrieval=True)
    tiles0 = jnp.zeros((2, PS, PS, 1), jnp.float32)
    params = jax.jit(wrapper.init)(
        jax.random.PRNGKey(0), tiles0, bank.noise_flat, bank.clean,
        bank.sq_norms,
    )["params"]
    extra = (params, bank.noise_flat, bank.clean, bank.sq_norms)

    # fresh frames per burst — the CLI shape (every burst new H2D bytes)
    all_frames = [
        np.stack([
            np.clip(
                120 + 60 * np.sin(xx / 19 + (b * BURST + f) % N_MEM)
                + 30 * np.cos(yy / 23)
                + rng.normal(0, 15, (H, W)), 0, 255).astype(np.uint8)
            for f in range(BURST)
        ])
        for b in range(n_bursts)
    ]

    def make_pre(chunk):
        def pre_tile_fn(tiles, params, bank_noise, bank_clean, bank_norms):
            mem = batched_select_memory_patch(tiles, bank_noise, bank_clean,
                                              bank_norms, use_pallas=True,
                                              chunk=chunk)
            return jnp.concatenate([tiles, mem.astype(tiles.dtype)], axis=-1)
        return pre_tile_fn

    def model_call(stack, params, bank_noise, bank_clean, bank_norms):
        return wrapper.apply({"params": params}, stack[..., :1], bank_noise,
                             bank_clean, bank_norms, mem_clean=stack[..., 1:])

    t_grid = len(range(0, H - PS, PS - OVERLAP)) + 1
    n_q = BURST * t_grid * t_grid  # 400 at the 704^2 burst-4 geometry
    results = {}
    outputs = {}
    for name, chunk in (("chunk128", 128), ("single_pass", n_q)):
        run = make_tiled_hann_runner_frames(
            model_call, BURST, H, W, ps=PS, overlap=OVERLAP, batch=-8,
            out_dtype="uint8_round", pre_tile_fn=make_pre(chunk),
        )
        t0 = time.perf_counter()
        out0 = np.asarray(run(all_frames[0], *extra))
        compile_s = time.perf_counter() - t0
        outputs[name] = out0

        # --- synchronous per-burst (the round-4 protocol) ---
        ts = []
        for b in all_frames[1:5]:
            t = time.perf_counter()
            np.asarray(run(b, *extra))
            ts.append(time.perf_counter() - t)
        sync_med = float(np.median(ts))

        # --- pipelined steady state: dispatch i+1, then fetch i ---
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            pending = None
            for b in all_frames:
                out = run(jnp.asarray(b), *extra)
                if pending is not None:
                    np.asarray(pending)
                pending = out
            np.asarray(pending)
            reps.append((time.perf_counter() - t0) / n_bursts)
        pipe = float(np.median(reps))

        results[name] = {
            "compile_s": round(compile_s, 1),
            "sync_s_per_burst": round(sync_med, 3),
            "sync_mps": round(BURST * H * W / 1e6 / sync_med, 3),
            "pipelined_s_per_burst": round(pipe, 3),
            "pipelined_mps": round(BURST * H * W / 1e6 / pipe, 3),
        }
        print(json.dumps({"mode": name, **results[name]}), flush=True)

    identical = bool(np.array_equal(outputs["chunk128"], outputs["single_pass"]))
    print(json.dumps({
        "kind": "e6_pipeline",
        "bank": "int8+u8clean",
        "outputs_byte_identical": identical,
        "chunk128_sync_mps": results["chunk128"]["sync_mps"],
        "chunk128_pipelined_mps": results["chunk128"]["pipelined_mps"],
        "single_pass_sync_mps": results["single_pass"]["sync_mps"],
        "single_pass_pipelined_mps": results["single_pass"]["pipelined_mps"],
    }), flush=True)
    assert identical, "retrieval chunking changed outputs!"


if __name__ == "__main__":
    main()
