"""Mesh-sharded memory bank + ring top-1 retrieval.

SURVEY §5 long-context: at the production stride of 4
(``eval_704_iqsl_memory.sh:38``) the (noise, clean) bank is ~13 GB f32 —
too big to replicate per chip next to params + activations. TPU-native
answer (scaling-book recipe): shard BOTH banks over the mesh's data axis so
per-chip HBM is ∝ 1/k, and retrieve with a **ring**: each step every device
scores its local queries against the bank shard it currently holds, updates a
running (best distance, best global index, best clean patch), then rotates
the shard to its ring neighbour with ``ppermute`` over ICI. After k steps
every device has scanned the full bank while only ever holding 1/k of it —
exactly the ring-attention dataflow, applied to nearest-neighbour lookup.

Tie-breaking matches the replicated path (reference ``torch.argmin``): the
global FIRST minimum wins, enforced by comparing (distance, global index)
lexicographically — shard visit order therefore does not matter.

Reference behavior being scaled: ``finetune_memory.py:1256-1277`` (top-1 L2
retrieval over device-resident banks).
"""
from __future__ import annotations

from dataclasses import replace
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .bank import MemoryBank

__all__ = ["shard_bank", "make_ring_retrieval"]


def shard_bank(bank: MemoryBank, mesh: Mesh, axis_name: str = "data") -> MemoryBank:
    """Re-lay a MemoryBank with N sharded over ``mesh[axis_name]``.

    Pads N up to a device multiple: padded noise rows get +inf squared norms
    (never selected), padded clean rows are zeros (unreachable). Per-device
    HBM for both banks drops to ceil(N/k)·row bytes.
    """
    k = int(mesh.shape[axis_name])
    n = int(bank.noise_flat.shape[0])
    n_pad = (-n) % k
    noise = bank.noise_flat
    norms = bank.sq_norms
    clean = bank.clean
    if n_pad:
        noise = jnp.concatenate(
            [noise, jnp.zeros((n_pad, noise.shape[1]), noise.dtype)], axis=0
        )
        # padded rows must never win: +inf norms (f32/bf16 banks) or int32
        # max (int8 banks, whose exact distances stay < 2·128²·D < 2³¹−1)
        pad_val = (jnp.iinfo(jnp.int32).max
                   if jnp.issubdtype(norms.dtype, jnp.integer) else jnp.inf)
        norms = jnp.concatenate(
            [norms, jnp.full((n_pad,), pad_val, norms.dtype)], axis=0
        )
        clean = jnp.concatenate(
            [clean, jnp.zeros((n_pad,) + clean.shape[1:], clean.dtype)], axis=0
        )
    row = NamedSharding(mesh, P(axis_name))
    return replace(
        bank,
        noise_flat=jax.device_put(noise, row),
        clean=jax.device_put(clean, row),
        sq_norms=jax.device_put(norms, row),
    )


def make_ring_retrieval(
    mesh: Mesh,
    axis_name: str = "data",
    queries_sharded: bool = True,
) -> Callable:
    """Build ``retrieval_fn(noisy, bank_noise_flat, bank_clean, sq_norms)``.

    The returned function is a drop-in for
    ``adapters.wrappers.select_memory_patch`` (plug it into
    ``DenoiserWithMemoryAdapter(retrieval_fn=...)``): it returns the winning
    clean patches [B,P,P,C] for a query batch [B,P,P,C].

    * banks must be sharded over ``axis_name`` on dim 0 (``shard_bank``);
    * ``queries_sharded=True`` expects the query batch dim sharded over the
      SAME axis (the tiled-eval engines do this when given a mesh) and B
      divisible by k; ``False`` replicates the queries on every device
      (each device still scans only its 1/k of the bank).
    """
    axis = axis_name
    q_spec = P(axis) if queries_sharded else P()

    def _ring(noisy, bank_noise, bank_clean, sq_norms):
        k = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        b = noisy.shape[0]
        q = jax.lax.stop_gradient(noisy).reshape(b, -1)

        int_bank = bank_noise.dtype == jnp.int8
        if int_bank:
            # exact-integer mode (see select_memory_patch): recenter the
            # uint8-sourced queries and accumulate b²−2ab in int32
            q = (jnp.round(q * 255.0) - 128.0).astype(jnp.int8)
            best_d = jnp.full((b,), jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            best_d = jnp.full((b,), jnp.inf, jnp.float32)
        best_i = jnp.full((b,), jnp.iinfo(jnp.int32).max, jnp.int32)
        best_c = jnp.zeros((b,) + bank_clean.shape[1:], bank_clean.dtype)

        n_local = bank_noise.shape[0]
        perm = [(i, (i - 1) % k) for i in range(k)]  # shard s → device s−1

        bank, clean, norms = bank_noise, bank_clean, sq_norms
        for s in range(k):
            owner = (me + s) % k  # shard originally resident on this rank
            # distance up to the per-query constant ‖q‖²: b² − 2ab (one MXU
            # dot with f32 — or exact int32 — accumulation); the constant
            # cancels in argmin and its omission is uniform across shards,
            # so cross-shard comparisons stay consistent.
            ab = jax.lax.dot_general(
                q if int_bank else q.astype(bank.dtype), bank,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32 if int_bank else jnp.float32,
            )
            if int_bank:
                d = norms[None, :].astype(jnp.int32) - 2 * ab  # [B, n_local]
            else:
                d = norms[None, :] - 2.0 * ab  # [B, n_local]
            loc_min = jnp.min(d, axis=1)
            loc_arg = jnp.argmin(d, axis=1).astype(jnp.int32)  # first-min
            glob_idx = owner * n_local + loc_arg
            cand_c = jnp.take(clean, loc_arg, axis=0)
            improve = (loc_min < best_d) | (
                (loc_min == best_d) & (glob_idx < best_i)
            )
            best_d = jnp.where(improve, loc_min, best_d)
            best_i = jnp.where(improve, glob_idx, best_i)
            bshape = (b,) + (1,) * (best_c.ndim - 1)
            best_c = jnp.where(improve.reshape(bshape), cand_c, best_c)
            if s < k - 1:
                bank = jax.lax.ppermute(bank, axis, perm)
                clean = jax.lax.ppermute(clean, axis, perm)
                norms = jax.lax.ppermute(norms, axis, perm)
        return best_c

    from jax.experimental.shard_map import shard_map

    def retrieval_fn(noisy, bank_noise_flat, bank_clean, sq_norms):
        return shard_map(
            _ring,
            mesh=mesh,
            in_specs=(q_spec, P(axis), P(axis), P(axis)),
            out_specs=q_spec,
            check_rep=False,
        )(noisy, bank_noise_flat, bank_clean, sq_norms)

    return retrieval_fn
