"""Train-step remat-policy sweep on the real TPU (VERDICT r4 item 2).

The production train step (reference workload train.py:354-368: Structure
loss, batch 4x352^2, fused batch-8 forward) has run with FULL remat since
round 3 — every RDB/ResBlock/UpBlock interior recomputes in the backward,
because the no-remat step needs ~19 GB > 16 GB v5e HBM (f32). But each
resolution level costs roughly equal recompute FLOPs while its activation
bytes halve per level, so selective remat (ImprovedUNet remat_depth=k: only
the k highest-resolution levels rematerialize) should buy back recompute
time within the HBM budget.

Sweeps {f32, bf16} x remat_depth in {full, 3, 2, 1, none} on the bench
geometry with the lag-1 fetch protocol (bench.py's). OOMs are caught and
reported as data points. Prints one JSON line per config plus a summary.

Usage: python scripts/tpu_remat_sweep.py [n_steps]   (default 6)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PS = 352
BATCH = 4


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import (create_train_state,
                                           make_structure_train_step)

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "ps": PS, "batch": BATCH, "n_steps": n_steps}),
          flush=True)

    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (BATCH, PS, PS, 1)).astype(np.uint8)
    noisy = rng.integers(0, 256, (BATCH, PS, PS, 1)).astype(np.uint8)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)

    configs = []
    for dtype_name in ("float32", "bfloat16"):
        for depth_name, kw in (("full", {"remat": True}),
                               ("d3", {"remat": True, "remat_depth": 3}),
                               ("d2", {"remat": True, "remat_depth": 2}),
                               ("d1", {"remat": True, "remat_depth": 1}),
                               ("none", {"remat": False})):
            configs.append((dtype_name, depth_name, kw))

    results = []
    for dtype_name, depth_name, kw in configs:
        dt = jnp.bfloat16 if dtype_name == "bfloat16" else None
        label = f"{dtype_name}/{depth_name}"
        try:
            model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dt, **kw)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
            state = create_train_state(params, lr=3e-4)
            step = make_structure_train_step(model.apply)
            t0 = time.perf_counter()
            state, m = step(state, clean, noisy)
            loss0 = float(m["loss"])  # compile + fetch
            compile_s = time.perf_counter() - t0
            # lag-1 protocol (bench.py / cli/train.py): dispatch i+1, fetch i
            t0 = time.perf_counter()
            pending = None
            for _ in range(n_steps):
                state, m = step(state, clean, noisy)
                if pending is not None:
                    loss = float(pending["loss"])
                pending = m
            loss = float(pending["loss"])
            dt_all = time.perf_counter() - t0
            assert np.isfinite(loss)
            s_per_step = dt_all / n_steps
            rec = {"config": label, "s_per_step": round(s_per_step, 4),
                   "compile_s": round(compile_s, 1),
                   "loss0": round(loss0, 5), "loss_end": round(loss, 5)}
        except Exception as e:  # noqa: BLE001 — OOM is a legit data point
            rec = {"config": label, "error": str(e)[:300]}
        finally:
            # free this config's HBM even when it OOMed mid-step — leaked
            # state/params would corrupt the NEXT config's OOM data point
            state = step = params = m = pending = None  # noqa: F841
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if "s_per_step" in r]
    if ok:
        best = min(ok, key=lambda r: r["s_per_step"])
        print(json.dumps({"kind": "remat_sweep_done", "best": best}), flush=True)


if __name__ == "__main__":
    main()
