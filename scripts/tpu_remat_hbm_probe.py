"""HBM occupancy of the NO-REMAT train step (round-5 remat sweep follow-up).

scripts/tpu_remat_sweep.py found the no-remat step FITS a 16 GB v5e after all
(f32 0.229 s/step, bf16 0.159) — contradicting the round-2 "needs ~19 GB and
OOMs" datapoint (measured then on the UNFUSED two-forward step). This probe
pins the peak/in-use HBM of the fused batch-8 no-remat program for both
dtypes, so the trainer-default decision (cli/train.py --remat) rests on a
measured headroom number, not on the stale OOM claim.

Usage: python scripts/tpu_remat_hbm_probe.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PS, BATCH = 352, 4


def main():
    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.models import ImprovedUNet
    from image_denoising_tpu.train import (create_train_state,
                                           make_structure_train_step)

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    rng = np.random.default_rng(0)
    clean = rng.integers(0, 256, (BATCH, PS, PS, 1)).astype(np.uint8)
    noisy = rng.integers(0, 256, (BATCH, PS, PS, 1)).astype(np.uint8)
    x0 = jnp.zeros((1, PS, PS, 1), jnp.float32)

    for dtype_name in ("float32", "bfloat16"):
        dt = jnp.bfloat16 if dtype_name == "bfloat16" else None
        for remat in (False, True):
            model = ImprovedUNet(in_nc=1, out_nc=1, n_feature=48, dtype=dt,
                                 remat=remat)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)["params"]
            state = create_train_state(params, lr=3e-4)
            step = make_structure_train_step(model.apply)
            state, m = step(state, clean, noisy)
            loss = float(m["loss"])
            assert np.isfinite(loss)
            rec = {"dtype": dtype_name, "remat": remat}
            try:
                stats = jax.devices()[0].memory_stats()
                for k in ("bytes_in_use", "peak_bytes_in_use",
                          "largest_alloc_size"):
                    if k in stats:
                        rec[k.replace("bytes", "gb")] = round(
                            stats[k] / 1e9, 2)
            except Exception as e:  # noqa: BLE001 — stats optional on axon
                rec["memory_stats_error"] = str(e)[:120]
            # per-program peak where PjRt exposes it via compiled memory
            # analysis (works even when live memory_stats doesn't); step is
            # already jitted (donate_argnums=0) so lower() is direct — state
            # here is the fresh post-step state, not the donated input
            try:
                lowered = step.lower(state, clean, noisy)
                mem = lowered.compile().memory_analysis()
                if mem is not None:
                    rec["program_temp_gb"] = round(
                        getattr(mem, "temp_size_in_bytes", 0) / 1e9, 2)
                    rec["program_arg_gb"] = round(
                        getattr(mem, "argument_size_in_bytes", 0) / 1e9, 2)
            except Exception as e:  # noqa: BLE001
                rec["memory_analysis_error"] = str(e)[:120]
            # true per-step FLOPs (recompute included iff the program remats)
            # — the honest-MFU input for bench.py's TRAIN_FLOPS_PER_STEP
            try:
                cost = step.lower(state, clean, noisy).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                if cost and "flops" in cost:
                    rec["program_tflops"] = round(cost["flops"] / 1e12, 4)
            except Exception as e:  # noqa: BLE001
                rec["cost_analysis_error"] = str(e)[:120]
            print(json.dumps(rec), flush=True)
            del state, step, params, model


if __name__ == "__main__":
    main()
