"""Retrieval-kernel tile sweep on the REAL TPU at the production bank.

The hoist A/B (scripts/tpu_hoist_ab.py) measured the streaming kernel at
~1% of HBM bandwidth (~150 us per grid step at the default (512, 2048)
tiles). This sweeps tile_n x tile_d against the 105k-patch int8 bank at
B=128 queries (the hoisted chunk), and races the XLA path (materialized
[B,N] distance matrix + argmin) at the same geometry — indices only, so
the D2H fetch is 512 B and timings are device-dominated.

Usage: python scripts/tpu_retrieval_sweep.py [bank_dtype]   (int8 default)
Prints one JSON line per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, D, B = 105472, 16384, 128  # production-padded bank, 128-query chunk


def main():
    bank_dtype = sys.argv[1] if len(sys.argv) > 1 else "int8"

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.memory.retrieval_pallas import top1_l2_retrieval

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "n": N, "d": D, "b": B, "bank_dtype": bank_dtype}),
          flush=True)
    rng = np.random.default_rng(0)
    if bank_dtype == "int8":
        bank = jax.device_put(
            rng.integers(-128, 128, (N, D)).astype(np.int8))
        sq = jax.device_put(
            np.sum(np.asarray(bank, np.int64) ** 2, axis=1).astype(np.int32))
        q = jax.device_put(rng.integers(-128, 128, (B, D)).astype(np.int8))
    else:
        # build host-side in the storage dtype: device_put(f32).astype(bf16)
        # would hold BOTH copies on the chip (10.3 GB) and OOM next to the
        # sweep's working set
        dt = jnp.bfloat16 if bank_dtype == "bfloat16" else jnp.float32
        host = rng.random((N, D)).astype(np.float32)
        sq_host = np.sum(host.astype(np.float64) ** 2, axis=1).astype(np.float32)
        bank = jax.device_put(np.asarray(host, dtype=dt))
        del host
        sq = jax.device_put(sq_host)
        q = jax.device_put(rng.random((B, D)).astype(np.float32))
    jax.block_until_ready((bank, sq, q))
    bank_gb = bank.size * bank.dtype.itemsize / 1e9

    def bench(fn, label):
        try:
            idx = np.asarray(fn())  # compile + fetch (512 B)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"config": label,
                              "error": str(e)[:200]}), flush=True)
            return None
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            idx2 = np.asarray(fn())
            ts.append(time.perf_counter() - t)
        assert np.array_equal(idx, idx2)
        med = float(np.median(ts))
        print(json.dumps({"config": label, "min_s": round(min(ts), 4),
                          "med_s": round(med, 4),
                          "eff_gbps": round(bank_gb / med, 1)}), flush=True)
        return idx

    ref = None
    for tile_n, tile_d in ((512, 2048), (512, 4096), (1024, 4096),
                           (512, 8192), (256, 16384), (512, 16384),
                           (2048, 4096), (1024, 8192)):
        if N % tile_n or D % tile_d:
            continue
        out = bench(
            lambda tn=tile_n, td=tile_d: top1_l2_retrieval(
                q, bank, sq, tile_n=tn, tile_d=td),
            f"pallas_{tile_n}x{tile_d}",
        )
        if out is not None:
            if ref is None:
                ref = out
            else:
                assert np.array_equal(out, ref), "tile config changed argmin!"

    # XLA comparator: materialized [B,N] + argmin
    @jax.jit
    def xla_retrieve(qq, bk, norms):
        if bk.dtype == jnp.int8:
            ab = jax.lax.dot_general(qq, bk, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            dist = norms[None, :].astype(jnp.int32) - 2 * ab
        else:
            ab = jax.lax.dot_general(qq.astype(bk.dtype), bk,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dist = norms[None, :] - 2.0 * ab
        return jnp.argmin(dist, axis=1).astype(jnp.int32)

    out = bench(lambda: xla_retrieve(q, bank, sq), "xla_BN")
    if out is not None and ref is not None:
        assert np.array_equal(out, ref), "xla argmin differs from pallas!"
    print(json.dumps({"kind": "retrieval_sweep_done",
                      "bank_dtype": bank_dtype}), flush=True)


if __name__ == "__main__":
    main()
