"""Ground-truth A/B for hoisted vs per-chunk retrieval on the REAL TPU.

The CLI-level steady-state protocol (drain-to-drain gaps) can overestimate
when the host stalls: finished bursts pile up and late drains return
instantly. This measures the device rate directly: one process, the
production memory regime (patch 128 / overlap 64 / 5 imgs / stride 4 →
105k-patch bank, int8 + streaming Pallas kernel, burst 4, tile chunk -8),
two compiled runners — hoisted retrieval (128-query chunks before the
forward) and per-chunk retrieval (inside every 8-tile forward chunk) —
each timed per burst with a full fetch (np.asarray) between dispatches
after a warmup burst. Reports min/median s/burst and MP/s for both.

Also times the retrieval alone (batched_select_memory_patch vs the same
via 8-query chunks) to attribute the delta.

Usage: python scripts/tpu_hoist_ab.py [bank_dtype]  (int8 default)
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
    bank_dtype = sys.argv[1] if len(sys.argv) > 1 else "int8"

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from image_denoising_tpu.adapters import (DenoiserWithMemoryAdapter,
                                              batched_select_memory_patch)
    from image_denoising_tpu.eval import make_tiled_hann_runner_frames
    from image_denoising_tpu.memory import build_memory_bank
    from image_denoising_tpu.models import ImprovedUNet

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)

    root = "/tmp/hoist_ab_data"
    os.makedirs(root + "/clean", exist_ok=True)
    os.makedirs(root + "/noise", exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(N_MEM):
        clean = (120 + 60 * np.sin(xx / 19 + i) + 30 * np.cos(yy / 23)).astype(np.uint8)
        noisy = np.clip(clean + rng.normal(0, 15, clean.shape), 0, 255).astype(np.uint8)
        Image.fromarray(clean).save(f"{root}/clean/f{i}.png")
        Image.fromarray(noisy).save(f"{root}/noise/f{i}.png")
    frames = np.stack([
        np.asarray(Image.open(f"{root}/noise/f{i % N_MEM}.png"), np.uint8)
        for i in range(BURST)
    ])

    clean_paths = [f"{root}/clean/f{i}.png" for i in range(N_MEM)]
    noise_paths = [f"{root}/noise/f{i}.png" for i in range(N_MEM)]
    t0 = time.perf_counter()
    bank = build_memory_bank(clean_paths, noise_paths, patch_size=PS,
                             stride=STRIDE, bank_dtype=bank_dtype, pad_to=512)
    jax.block_until_ready(bank.noise_flat)
    print(json.dumps({"bank_s": round(time.perf_counter() - t0, 1),
                      "n": bank.size}), flush=True)

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

    # --- retrieval-only A/B -------------------------------------------------
    t_grid = len(range(0, H - PS, PS - OVERLAP)) + 1
    n_q = BURST * t_grid * t_grid
    q = jnp.asarray(rng.random((n_q, PS, PS, 1)).astype(np.float32))

    def time_fn(fn, *args, reps=4):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
        ts = []
        for _ in range(reps):
            t = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t)
        return min(ts), float(np.median(ts))

    # banks must be runtime ARGS: a closure would embed multi-GB constants
    # into the jaxpr and stall host-side constant handling for an hour
    # (observed: 67 GB RSS) — the CLI always passes them as args too
    r128 = jax.jit(lambda qq, bn, bc, bs: batched_select_memory_patch(
        qq, bn, bc, bs, use_pallas=True, chunk=128))
    r8 = jax.jit(lambda qq, bn, bc, bs: batched_select_memory_patch(
        qq, bn, bc, bs, use_pallas=True, chunk=8))
    mn, md = time_fn(r128, q, bank.noise_flat, bank.clean, bank.sq_norms)
    print(json.dumps({"retrieval": "chunk128", "queries": n_q,
                      "min_s": round(mn, 3), "med_s": round(md, 3)}), flush=True)
    mn8, md8 = time_fn(r8, q, bank.noise_flat, bank.clean, bank.sq_norms)
    print(json.dumps({"retrieval": "chunk8", "queries": n_q,
                      "min_s": round(mn8, 3), "med_s": round(md8, 3)}), flush=True)

    # --- full-burst A/B -----------------------------------------------------
    def pre_tile_fn(tiles, params, bank_noise, bank_clean, bank_norms):
        mem = batched_select_memory_patch(tiles, bank_noise, bank_clean,
                                          bank_norms, use_pallas=True)
        return jnp.concatenate([tiles, mem.astype(tiles.dtype)], axis=-1)

    def model_call_hoist(stack, params, bank_noise, bank_clean, bank_norms):
        return wrapper.apply({"params": params}, stack[..., :1], bank_noise,
                             bank_clean, bank_norms, mem_clean=stack[..., 1:])

    def model_call_plain(tiles, params, bank_noise, bank_clean, bank_norms):
        return wrapper.apply({"params": params}, tiles, bank_noise,
                             bank_clean, bank_norms)

    results = {}
    for name, (mc, pre) in {
        "hoist": (model_call_hoist, pre_tile_fn),
        "per_chunk": (model_call_plain, None),
    }.items():
        run = make_tiled_hann_runner_frames(
            mc, BURST, H, W, ps=PS, overlap=OVERLAP, batch=-8,
            out_dtype="uint8_round", pre_tile_fn=pre,
        )
        t0 = time.perf_counter()
        np.asarray(run(frames, *extra))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            np.asarray(run(frames, *extra))
            ts.append(time.perf_counter() - t)
        s_burst = float(np.median(ts))
        mps = BURST * H * W / 1e6 / s_burst
        results[name] = {"compile_s": round(compile_s, 1),
                         "s_per_burst_min": round(min(ts), 3),
                         "s_per_burst_med": round(s_burst, 3),
                         "mps_med": round(mps, 3)}
        print(json.dumps({"mode": name, **results[name]}), flush=True)

    print(json.dumps({"kind": "hoist_ab", "bank_dtype": bank_dtype,
                      "hoist_mps": results["hoist"]["mps_med"],
                      "per_chunk_mps": results["per_chunk"]["mps_med"]}),
          flush=True)


if __name__ == "__main__":
    main()
