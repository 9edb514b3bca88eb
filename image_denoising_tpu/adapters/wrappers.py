"""Frozen-base + adapter wrapper modules.

* ``DenoiserWithAdapter`` — reference ``adapter.py:29-67``: frozen base
  forward (stop_gradient ≙ torch no_grad), OutputAdapter refinement. Params
  tree = {base: …, adapter: …} so the ``epoch_adapter`` (full wrapper) and
  ``epoch_adapter_only`` checkpoint roles map directly to subtrees.
* ``DenoiserWithMemoryAdapter`` — reference ``finetune_memory.py:1195-1291``:
  frozen base + selectable memory adapter (v1–v5) + top-1 L2 retrieval over a
  (noise, clean) patch bank. The banks are *inputs*, not params (the reference
  registers them as buffers and never checkpoints them — rebuilt from data).

Freezing is expressed at the optimizer level (gradients masked to the adapter
subtree — see train/finetune step factories); stop_gradient on the base output
gives the same backward cut as torch's no_grad wrapper.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from .memory_adapters import build_memory_adapter
from .output_adapter import OutputAdapter

__all__ = [
    "DenoiserWithAdapter",
    "DenoiserWithMemoryAdapter",
    "select_memory_patch",
    "batched_select_memory_patch",
]


class DenoiserWithAdapter(nn.Module):
    base: nn.Module
    in_channels: int = 1
    hidden_channels: int = 16
    use_no_grad_for_base: bool = True

    @nn.compact
    def __call__(self, x):
        base_out = self.base(x)
        if self.use_no_grad_for_base:
            base_out = jax.lax.stop_gradient(base_out)
        return OutputAdapter(
            in_channels=self.in_channels,
            hidden_channels=self.hidden_channels,
            name="adapter",
        )(x, base_out)


def _clean01(mem):
    """uint8-stored clean banks (build_memory_bank(clean_dtype="uint8")) come
    back from the gather as bytes — decode to the exact k/255 floats.

    Decode is a 256-entry table lookup, NOT ``x / 255.``: XLA rewrites the
    division into a reciprocal multiply, which is 1 ULP off numpy's correctly
    rounded division for some bytes — the table is built with the same numpy
    f32 division the f32 bank builder uses, so uint8 storage is bit-identical
    to the f32-stored bank.
    """
    if mem.dtype == jnp.uint8:
        import numpy as _np

        table = jnp.asarray(
            _np.arange(256, dtype=_np.float32) / _np.float32(255.0)
        )
        return jnp.take(table, mem.astype(jnp.int32))
    return mem


def select_memory_patch(noisy, memory_noise_flat, memory_clean, sq_norms=None,
                        use_pallas: bool = False):
    """Top-1 L2 retrieval: ‖noisy − bank‖² via a²+b²−2ab matmul + argmin.

    noisy: [B,P,P,C]; memory_noise_flat: [N,D] (D = P·P·C);
    memory_clean: [N,P,P,C]. Returns [B,P,P,C].

    TPU notes: the [B,N] distance matrix comes from one MXU matmul with f32
    accumulation; jnp.argmin tie-breaks to the first minimum exactly like
    torch. The banks live in HBM; the gather of the winning clean patches is
    one dynamic gather. ``use_pallas=True`` switches to the streaming Pallas
    kernel (memory/retrieval_pallas.py) that never materializes [B,N] —
    preferable at production bank sizes (stride 4 ⇒ N ~ 1e5).

    An **int8 bank** (``build_memory_bank(bank_dtype="int8")``) switches to
    exact integer distances on the MXU's double-rate int8 path: queries are
    uint8-sourced (x = k/255), so ``round(x·255) − 128`` recovers the
    centered byte exactly and a²+b²−2ab accumulates in int32 with zero
    rounding — 4× less bank HBM than f32 and immune to the f32 path's
    near-tie misranking. ``use_pallas`` composes: the streaming kernel runs
    the same exact int32 arithmetic while moving 4× fewer bank bytes.
    """
    b = noisy.shape[0]
    noisy_flat = jax.lax.stop_gradient(noisy).reshape(b, -1)
    if memory_noise_flat.dtype == jnp.int8:
        q = (jnp.round(noisy_flat * 255.0) - 128.0).astype(jnp.int8)
        if sq_norms is None:
            bi = memory_noise_flat.astype(jnp.int32)
            sq_norms = jnp.sum(bi * bi, axis=1)
        if use_pallas:
            from ..memory.retrieval_pallas import top1_l2_retrieval

            n, d = memory_noise_flat.shape
            tile_d = 2048 if d % 2048 == 0 else d
            tile_n = 512 if n % 512 == 0 else n
            idx = top1_l2_retrieval(q, memory_noise_flat,
                                    sq_norms.astype(jnp.int32),
                                    tile_n=tile_n, tile_d=tile_d)
            return _clean01(jnp.take(memory_clean, idx, axis=0))
        qi = q.astype(jnp.int32)
        a2 = jnp.sum(qi * qi, axis=1, keepdims=True)  # [B,1] int32
        ab = jax.lax.dot_general(
            q, memory_noise_flat,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B,N] int32, exact
        dists = a2 + sq_norms[None, :].astype(jnp.int32) - 2 * ab
        idx = jnp.argmin(dists, axis=1)
        return _clean01(jnp.take(memory_clean, idx, axis=0))
    if sq_norms is None:
        sq_norms = jnp.sum(memory_noise_flat.astype(jnp.float32) ** 2, axis=1)
    if use_pallas:
        from ..memory.retrieval_pallas import top1_l2_retrieval

        n, d = memory_noise_flat.shape
        tile_d = 2048 if d % 2048 == 0 else d
        tile_n = 512 if n % 512 == 0 else n
        idx = top1_l2_retrieval(noisy_flat, memory_noise_flat, sq_norms,
                                tile_n=tile_n, tile_d=tile_d)
        return _clean01(jnp.take(memory_clean, idx, axis=0))
    a2 = jnp.sum(noisy_flat**2, axis=1, keepdims=True)  # [B,1]
    ab = jax.lax.dot_general(
        noisy_flat, memory_noise_flat,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B,N]
    dists = a2 + sq_norms[None, :] - 2.0 * ab
    idx = jnp.argmin(dists, axis=1)
    return _clean01(jnp.take(memory_clean, idx, axis=0))


def batched_select_memory_patch(noisy, memory_noise_flat, memory_clean,
                                sq_norms=None, use_pallas: bool = False,
                                chunk: int = 128):
    """One retrieval pass over a WHOLE tile stack in MXU-row-sized query
    chunks (``lax.map`` over chunks of ``chunk`` queries, zero-padded tail).

    The point is bank traffic: the streaming kernel (and the XLA matmul)
    sweeps the full bank from HBM once per *call*, so retrieving inside a
    small tile-scan chunk (the ``--tile_batch -8`` forward shape that the
    conv engine wants, docs/PERF.md) pays ⌈T/8⌉ bank sweeps per frame where
    ⌈T/128⌉ suffice — at the production 105k-patch stride-4 bank
    (``eval_704_iqsl_memory.sh:34-38``) that is ~16× the HBM bytes of this
    hoisted form. 128-query chunks also fill the MXU's 128-row systolic
    dimension (B=8 uses 1/16 of it).

    Numerics: identical math per query row; the Pallas kernel's accumulation
    order over D-tiles is query-independent, and the int8 path is exact
    integer arithmetic, so results match the per-forward-chunk retrieval.
    """
    t = noisy.shape[0]
    if t <= chunk:
        return select_memory_patch(noisy, memory_noise_flat, memory_clean,
                                   sq_norms, use_pallas=use_pallas)
    pad = (-t) % chunk
    q = noisy
    if pad:
        q = jnp.concatenate(
            [q, jnp.zeros((pad,) + q.shape[1:], q.dtype)], axis=0
        )
    chunks = q.reshape(q.shape[0] // chunk, chunk, *q.shape[1:])
    mem = jax.lax.map(
        lambda c: select_memory_patch(c, memory_noise_flat, memory_clean,
                                      sq_norms, use_pallas=use_pallas),
        chunks,
    )
    return mem.reshape(-1, *mem.shape[2:])[:t]


class DenoiserWithMemoryAdapter(nn.Module):
    """``retrieval_fn`` overrides the built-in top-1 lookup — e.g. the
    mesh-sharded ring retrieval (``memory.sharded.make_ring_retrieval``) when
    the bank is too big to replicate per chip. Signature:
    ``(noisy, memory_noise_flat, memory_clean, bank_sq_norms) -> mem_clean``.

    ``mem_clean=`` skips retrieval entirely and uses the given patches —
    the hoisted-retrieval path of the tiled evaluators (retrieve once for
    the whole tile stack via ``batched_select_memory_patch``, then run the
    conv forward in its own chunk size).
    """

    base: nn.Module
    in_channels: int = 1
    hidden_channels: int = 16
    variant: str = "hyper_gated_fft"  # v5 — the reference's active adapter
    pallas_retrieval: bool = False  # stream the bank through VMEM (big banks)
    retrieval_fn: Callable | None = None  # e.g. sharded-bank ring retrieval

    @nn.compact
    def __call__(self, noisy, memory_noise_flat, memory_clean,
                 bank_sq_norms=None, mem_clean=None):
        base_out = jax.lax.stop_gradient(self.base(noisy))
        if mem_clean is None:
            if self.retrieval_fn is not None:
                mem_clean = self.retrieval_fn(
                    noisy, memory_noise_flat, memory_clean, bank_sq_norms
                )
            else:
                mem_clean = select_memory_patch(
                    noisy, memory_noise_flat, memory_clean, bank_sq_norms,
                    use_pallas=self.pallas_retrieval,
                )
        # uint8-stored clean banks (ring retrieval / precomputed mem_clean
        # pass bytes through) decode to their exact source floats here
        mem_clean = _clean01(mem_clean)
        adapter = build_memory_adapter(
            self.variant, self.in_channels, self.hidden_channels, name="adapter"
        )
        return adapter(noisy, base_out, mem_clean)
