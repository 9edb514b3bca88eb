"""Pallas TPU kernel: streaming top-1 L2 retrieval over an HBM memory bank.

The memory-bounded regime (bank stride 4 ⇒ ~1e5 resident 128² patches,
``eval_704_iqsl_memory.sh:38``) makes the retrieval distance matrix the hot
op: for queries Q[B,D] against bank M[N,D] (D = P·P·C = 16384), computing
argmin‖q−m‖² needs the [B,N] matrix of a²+b²−2ab.

The XLA path (wrappers.select_memory_patch) materializes [B,N] in HBM. This
kernel never does: the bank streams through VMEM in (TILE_N × TILE_D) blocks
on a 2-D grid; partial q·mᵀ products accumulate in a VMEM scratch across the
D axis (MXU dots), and at each row-tile's last D-block the running
(min, argmin) pair in SMEM-backed scratch is updated. Ties break to the
FIRST minimum (strict <), matching torch argmin.

Two dtype regimes, selected by the bank's dtype:

* **f32 / bf16 banks** — f32 MXU accumulation, f32 running distances
  (queries are cast to the bank dtype on the way in).
* **int8 banks** (centered bytes, ``build_memory_bank(bank_dtype="int8")``)
  — the MXU's double-rate int8 path with int32 accumulation: b²−2ab is
  EXACT in int32 (|b²| ≤ D·127², |2ab| ≤ 2·D·128·127 < 2³¹), so the kernel
  streams 4× fewer bank bytes than f32 with zero rounding anywhere.
  Queries must already be centered int8 (round(x·255)−128) and sq_norms
  int32 — the same contract as the XLA int8 path.

Output: best bank index per query [B] int32 — the clean-patch gather stays
outside (one dynamic gather from HBM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["top1_l2_retrieval", "pad_bank_for_retrieval"]


def _worst(dtype):
    """The 'never selected' distance: +inf for floats, INT_MAX for ints."""
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.inf
    return jnp.iinfo(dtype).max


def _kernel(q_ref, sqn_ref, bank_ref, out_idx_ref, ab_acc, best_d, best_i):
    """Grid (nN, nD): j = D-tile (minor), i = N-tile (major)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    # reset accumulators at the very first block
    @pl.when((i == 0) & (j == 0))
    def _():
        best_d[:] = jnp.full_like(best_d, _worst(best_d.dtype))
        best_i[:] = jnp.zeros_like(best_i)

    @pl.when(j == 0)
    def _():
        ab_acc[:] = jnp.zeros_like(ab_acc)

    # partial dot: q[B, TILE_D] · bank[TILE_N, TILE_D]ᵀ → [B, TILE_N];
    # f32 accumulation for float banks, exact int32 for int8 banks
    ab_acc[:] += jax.lax.dot_general(
        q_ref[:], bank_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=ab_acc.dtype,
    )

    @pl.when(j == n_j - 1)
    def _():
        tile_n = bank_ref.shape[0]
        # dist (up to the constant a²) = b² − 2ab
        dist = sqn_ref[:] - 2 * ab_acc[:]
        tile_min = jnp.min(dist, axis=1)  # [B]
        # first-min argmin without the reduce-with-index primitive: Mosaic's
        # argmin lowering is f32-only (jax _reduce_index_helper raises
        # NotImplementedError for the int32 distances of int8 banks), so take
        # the SMALLEST index where dist hits the row min — identical
        # tie-breaking (torch argmin = first minimum) on every dtype.
        iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        tile_arg = jnp.min(
            jnp.where(dist == tile_min[:, None], iota, tile_n), axis=1
        )
        global_arg = i * tile_n + tile_arg
        improve = tile_min < best_d[:, 0]  # strict < keeps earlier tiles on tie
        best_i[:, 0] = jnp.where(improve, global_arg, best_i[:, 0])
        best_d[:, 0] = jnp.where(improve, tile_min, best_d[:, 0])

    n_i = pl.num_programs(0)

    @pl.when((i == n_i - 1) & (j == n_j - 1))
    def _():
        out_idx_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_d"))
def top1_l2_retrieval(queries_flat, bank_flat, bank_sq_norms,
                      tile_n: int = 512, tile_d: int = 2048):
    """queries_flat [B,D], bank_flat [N,D], sq_norms [N] → best index [B]
    int32. N must divide by tile_n, D by tile_d (callers pad the bank;
    padding rows are excluded via sq_norms = +inf / INT32_MAX).

    f32/bf16 banks take f32 queries (cast to the bank dtype here) and f32
    sq_norms; int8 banks take centered-int8 queries and int32 sq_norms —
    distances then accumulate exactly in int32 on the MXU's int8 path.
    """
    b, d = queries_flat.shape
    n = bank_flat.shape[0]
    assert n % tile_n == 0 and d % tile_d == 0, (n, d, tile_n, tile_d)
    grid = (n // tile_n, d // tile_d)

    int_bank = bank_flat.dtype == jnp.int8
    if int_bank:
        assert queries_flat.dtype == jnp.int8, (
            "int8 banks need centered-int8 queries (round(x*255)-128); got "
            f"{queries_flat.dtype}"
        )
        assert bank_sq_norms.dtype == jnp.int32, bank_sq_norms.dtype
        q = queries_flat
        acc_dtype = jnp.int32
    else:
        q = queries_flat.astype(bank_flat.dtype)
        bank_sq_norms = bank_sq_norms.astype(jnp.float32)
        acc_dtype = jnp.float32

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, tile_d), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_d), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((b, tile_n), acc_dtype),  # ab accumulator
            pltpu.VMEM((b, 1), acc_dtype),       # running min dist
            pltpu.VMEM((b, 1), jnp.int32),       # running argmin
        ],
    )(q, bank_sq_norms.reshape(1, n), bank_flat)[:, 0]


def pad_bank_for_retrieval(bank_flat, bank_sq_norms, tile_n: int = 512):
    """Pad N up to a tile multiple; padded rows get +inf (float) or INT32_MAX
    (int8 banks) norms so they are never chosen."""
    n, d = bank_flat.shape
    n_pad = (-n) % tile_n
    if n_pad == 0:
        return bank_flat, bank_sq_norms
    bank_flat = jnp.concatenate(
        [bank_flat, jnp.zeros((n_pad, d), bank_flat.dtype)], axis=0
    )
    worst = np.asarray(_worst(bank_sq_norms.dtype), bank_sq_norms.dtype)
    bank_sq_norms = jnp.concatenate(
        [bank_sq_norms, jnp.full((n_pad,), worst, bank_sq_norms.dtype)], axis=0
    )
    return bank_flat, bank_sq_norms
