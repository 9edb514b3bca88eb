"""Retrieval cost vs QUERY-batch size at the production bank, on the real TPU.

Round-4's tile sweep (scripts/tpu_retrieval_sweep.py) fixed B=128 queries and
found every kernel/tile config lands at 25-27 ms per pass over the 105k-patch
int8 bank — "lowering-bound". What it never measured is how the pass scales
with B: the hoisted retrieval (adapters.batched_select_memory_patch) runs a
4-frame burst's 400 queries as FOUR 128-query passes, each re-streaming the
full 1.7 GB bank. If the pass is bound per-sweep (bank streaming / pipeline
latency) rather than per-MAC, one 512-query pass costs ~the same as one
128-query pass and retrieval per burst drops ~4x — the lever VERDICT r4 #1
needs to lift the production E6 regime past 4.5 MP/s.

Measures, on the production-padded geometry (N=105472, D=16384, int8 bank):
  * top1_l2_retrieval (streaming Pallas kernel) at B in {128, 256, 512, 1024}
  * the XLA materialized-[B,N] path at the same Bs
  * argmin equality across all configs (int8 distances are exact integers)

Prints one JSON line per config. Reference geometry: 128-px patches, stride 4,
5 x 704^2 memory images (eval_704_iqsl_memory.sh:34-38); a burst-4 Hann grid
is 400 queries, burst-8 is 800.

Usage: python scripts/tpu_retrieval_qbatch_sweep.py [bank_dtype]  (int8 default)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, D = 105472, 16384
BS = (128, 256, 512, 1024)


def main():
    bank_dtype = sys.argv[1] if len(sys.argv) > 1 else "int8"

    import jax
    import jax.numpy as jnp

    from image_denoising_tpu.memory.retrieval_pallas import top1_l2_retrieval

    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "n": N, "d": D, "bank_dtype": bank_dtype}), flush=True)
    rng = np.random.default_rng(0)
    if bank_dtype == "int8":
        bank = jax.device_put(rng.integers(-128, 128, (N, D)).astype(np.int8))
        sq = jax.device_put(
            np.sum(np.asarray(bank, np.int64) ** 2, axis=1).astype(np.int32))
        q_host = rng.integers(-128, 128, (max(BS), D)).astype(np.int8)
    else:
        dt = jnp.bfloat16 if bank_dtype == "bfloat16" else jnp.float32
        host = rng.random((N, D)).astype(np.float32)
        sq_host = np.sum(host.astype(np.float64) ** 2, axis=1).astype(np.float32)
        bank = jax.device_put(np.asarray(host, dtype=dt))
        del host
        sq = jax.device_put(sq_host)
        q_host = rng.random((max(BS), D)).astype(np.float32)
    jax.block_until_ready((bank, sq))
    bank_gb = bank.size * bank.dtype.itemsize / 1e9

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

    def bench(fn, label, b):
        try:
            t0 = time.perf_counter()
            idx = np.asarray(fn())  # compile + fetch (tiny)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(json.dumps({"config": label, "b": b,
                              "error": str(e)[:200]}), flush=True)
            return None
        ts = []
        for _ in range(5):
            t = time.perf_counter()
            idx2 = np.asarray(fn())
            ts.append(time.perf_counter() - t)
        assert np.array_equal(idx, idx2)
        med = float(np.median(ts))
        print(json.dumps({
            "config": label, "b": b, "compile_s": round(compile_s, 1),
            "min_s": round(min(ts), 4), "med_s": round(med, 4),
            "eff_gbps": round(bank_gb / med, 1),
            "ms_per_128q": round(1e3 * med * 128 / b, 2),
        }), flush=True)
        return idx

    ref_by_b = {}
    for b in BS:
        q = jax.device_put(q_host[:b])
        np.asarray(q)
        out = bench(lambda qq=q: top1_l2_retrieval(qq, bank, sq,
                                                   tile_n=512, tile_d=2048),
                    "pallas_512x2048", b)
        if out is not None:
            ref_by_b[b] = out
        out = bench(lambda qq=q: xla_retrieve(qq, bank, sq), "xla_BN", b)
        if out is not None and b in ref_by_b:
            assert np.array_equal(out, ref_by_b[b]), "xla != pallas argmin!"
        # consistency across B: the first 128 queries are shared
        if b in ref_by_b and 128 in ref_by_b and b != 128:
            assert np.array_equal(ref_by_b[b][:128], ref_by_b[128]), \
                "query batch size changed argmins!"

    print(json.dumps({"kind": "retrieval_qbatch_sweep_done",
                      "bank_dtype": bank_dtype}), flush=True)


if __name__ == "__main__":
    main()
