"""Huge-frame tiled eval on the real TPU (VERDICT r4 next #5).

SURVEY §5 calls frame size this workload's sequence-length axis; the >256-tile
``_scatter_blend`` fallback (eval/tiled.py) had only CPU monkeypatch-threshold
coverage. This runs a REAL >256-tile frame through the E2 pyramid engine on
silicon:

* 4672² synthetic frame → 17×17 = 289 tiles of 352² (stride 288) — past the
  _UNROLL_MAX_TILES=256 threshold, so the production code path IS the
  fori_loop scatter blend. Measures compile time and steady-state MP/s.
* Correctness: a second program returns the raw per-tile predictions; the
  blend is recomputed on the HOST with the same pyramid math (numpy f64) and
  compared to the engine's uint8 output — isolates exactly the part the
  fallback changes (gather+forward are shared subgraphs).
* A Hann-engine leg at 2816² (43×43 = 1849 tiles, also scatter) with a small
  4k bank exercises E6's fallback on silicon too.

Usage: python scripts/tpu_huge_frame.py [pyr_hw] [hann_hw]  (4672 2816)
Prints one JSON line per leg.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PS, OVERLAP = 352, 64


def main():
    pyr_hw = int(sys.argv[1]) if len(sys.argv) > 1 else 4672
    hann_hw = int(sys.argv[2]) if len(sys.argv) > 2 else 2816

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.eval.tiled import (
        _UNROLL_MAX_TILES, hann_window_2d, edge_aligned_grid,
        make_tiled_hann_runner, make_tiled_pyramid_runner,
        pyramid_weight_mask, reference_tile_grid, _reflect_indices)
    from image_denoising_tpu.models import ImprovedUNet

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "pyr_hw": pyr_hw, "hann_hw": hann_hw}), flush=True)

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:pyr_hw, 0:pyr_hw]
    frame = np.clip(120 + 60 * np.sin(xx / 19) + 30 * np.cos(yy / 23)
                    + rng.normal(0, 15, (pyr_hw, pyr_hw)),
                    0, 255).astype(np.uint8)
    del yy, xx

    model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]

    def fwd(tiles, p):
        return model.apply({"params": p}, tiles)

    # --- E2 pyramid at pyr_hw² (the scatter-blend path) -------------------
    grid = reference_tile_grid(pyr_hw, pyr_hw, PS, PS - OVERLAP)
    n_tiles = len(grid)
    assert n_tiles > _UNROLL_MAX_TILES, (
        f"{pyr_hw}² is only {n_tiles} tiles — not the scatter regime")
    run = make_tiled_pyramid_runner(fwd, pyr_hw, pyr_hw, PS, OVERLAP,
                                    batch=-8, out_dtype="uint8_floor")
    t0 = time.perf_counter()
    out, l1 = run(jnp.asarray(frame), params)
    out = np.asarray(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t = time.perf_counter()
        out = np.asarray(run(jnp.asarray(frame), params)[0])
        ts.append(time.perf_counter() - t)
    med = float(np.median(ts))
    print(json.dumps({
        "leg": "pyramid_scatter", "hw": pyr_hw, "tiles": n_tiles,
        "compile_s": round(compile_s, 1), "s_per_frame": round(med, 3),
        "mps": round(pyr_hw * pyr_hw / 1e6 / med, 3),
        "l1": round(float(l1), 5),
    }), flush=True)

    # --- correctness: host-blend oracle from the same tile forwards --------
    row_idx = jnp.asarray(np.stack(
        [_reflect_indices(r0, th, PS) for (r0, _, th, _) in grid]))
    col_idx = jnp.asarray(np.stack(
        [_reflect_indices(c0, tw, PS) for (_, c0, _, tw) in grid]))

    @jax.jit
    def tile_preds(noisy255, p):
        img = noisy255.astype(jnp.float32) / 255.0
        tiles = img[row_idx[:, :, None], col_idx[:, None, :]][..., None]
        pad = (-tiles.shape[0]) % 8
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
        chunks = tiles.reshape(-1, 8, PS, PS, 1)
        preds = jax.lax.map(lambda c: fwd(c, p), chunks)
        return preds.reshape(-1, PS, PS)[:n_tiles]

    preds = np.asarray(tile_preds(jnp.asarray(frame), params), np.float32)
    mask = pyramid_weight_mask(PS).astype(np.float64)
    canvas = np.zeros((pyr_hw, pyr_hw), np.float64)
    contrib = np.zeros((pyr_hw, pyr_hw), np.float64)
    for i, (r0, c0, th, tw) in enumerate(grid):
        p = np.clip(preds[i, :th, :tw].astype(np.float64), 0.0, 1.0)
        canvas[r0:r0 + th, c0:c0 + tw] += p * mask[:th, :tw]
        contrib[r0:r0 + th, c0:c0 + tw] += mask[:th, :tw]
    contrib[contrib == 0] = 1.0
    oracle = np.clip(canvas / contrib * 255.0, 0, 255).astype(np.uint8)
    diff = np.abs(out.astype(np.int32) - oracle.astype(np.int32))
    print(json.dumps({
        "leg": "pyramid_scatter_vs_host_oracle",
        "max_abs_diff_uint8": int(diff.max()),
        "mismatch_frac": round(float((diff > 0).mean()), 6),
        "mismatch_gt1_frac": round(float((diff > 1).mean()), 8),
    }), flush=True)
    del preds, canvas, contrib, oracle, diff

    # --- E6 Hann engine at hann_hw² (scatter path, small bank) -------------
    hgrid = edge_aligned_grid(hann_hw, hann_hw, 128, 64)
    if len(hgrid) > _UNROLL_MAX_TILES:
        from image_denoising_tpu.adapters import DenoiserWithMemoryAdapter

        wrapper = DenoiserWithMemoryAdapter(base=model, in_channels=1,
                                            hidden_channels=16,
                                            pallas_retrieval=True)
        nb = 4096
        bank_n = (rng.integers(0, 256, (nb, 128 * 128)) - 128).astype(np.int8)
        bank_c = rng.integers(0, 256, (nb, 128, 128, 1)).astype(np.uint8)
        sq = np.sum(bank_n.astype(np.int64) ** 2, axis=1).astype(np.int32)
        bank_n, bank_c, sq = (jnp.asarray(bank_n), jnp.asarray(bank_c),
                              jnp.asarray(sq))
        tiles0 = jnp.zeros((2, 128, 128, 1), jnp.float32)
        wparams = jax.jit(wrapper.init)(
            jax.random.PRNGKey(0), tiles0, bank_n, bank_c, sq)["params"]

        def wcall(tiles, p, bn, bc, bs):
            return wrapper.apply({"params": p}, tiles, bn, bc, bs)

        hframe = frame[:hann_hw, :hann_hw]
        hrun = make_tiled_hann_runner(wcall, hann_hw, hann_hw, 128, 64,
                                      batch=-8, out_dtype="uint8_round")
        t0 = time.perf_counter()
        hout = np.asarray(hrun(jnp.asarray(hframe), wparams, bank_n, bank_c, sq))
        hcompile = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t = time.perf_counter()
            hout = np.asarray(hrun(jnp.asarray(hframe), wparams,
                                   bank_n, bank_c, sq))
            ts.append(time.perf_counter() - t)
        hmed = float(np.median(ts))
        print(json.dumps({
            "leg": "hann_scatter_memory", "hw": hann_hw, "tiles": len(hgrid),
            "compile_s": round(hcompile, 1), "s_per_frame": round(hmed, 3),
            "mps": round(hann_hw * hann_hw / 1e6 / hmed, 3),
            "out_mean": round(float(hout.mean()), 2),
        }), flush=True)

    print(json.dumps({"kind": "huge_frame_done"}), flush=True)


if __name__ == "__main__":
    main()
