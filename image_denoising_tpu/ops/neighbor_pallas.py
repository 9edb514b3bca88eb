"""Pallas TPU kernel: fused Neighbor2Neighbor sub-sampling.

One kernel launch replaces the reference's four-step pipeline (random draw →
LUT index → boolean masks → per-channel masked gathers, ``train.py:141-190``):
the per-2×2-cell pair choice is drawn with the on-core PRNG
(``pltpu.prng_random_bits``; 2³² % 8 == 0 so ``bits % 8`` is exactly uniform),
decoded to the two cell positions with a compare/select chain on the VPU, and
both half-resolution sub-images are emitted in the same pass — no boolean
masks, no index materialization, one trip through VMEM.

Layout: the grid runs over (image, channel) planes of shape [H/2, W/2] so the
minor axis is W/2 — lane-aligned (a trailing C=1 axis would pad every block to
128 lanes and blow VMEM). The PRNG is seeded per-image only, so all channel
planes of an image draw identical cell choices (the reference shares masks
across channels).

The selector maps (sel1, sel2) are also emitted so the *same* draw can be
applied to the denoised frame (the N2N regularizer needs identical masks,
``training_script.md:137-144``); that second application is a cheap XLA
``take_along_axis`` (ops.neighbor.generate_subimages).

The random stream differs from the XLA path's jax.random (different PRNG);
the distribution is identical. Both paths share the same test oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["subsample_pair_pallas"]

# position tables for the 8 ordered neighbor pairs (train.py:151-154)
_POS1 = (0, 0, 1, 2, 1, 2, 3, 3)
_POS2 = (1, 2, 3, 3, 0, 0, 1, 2)


def _select_pos(pos, tl, tr, bl, br):
    """4-way cell-value select by position map (0=TL 1=TR 2=BL 3=BR)."""
    return jnp.where(
        pos == 0, tl, jnp.where(pos == 1, tr, jnp.where(pos == 2, bl, br))
    )


def _lut(rd, table):
    out = jnp.full(rd.shape, table[7], jnp.int32)
    for v in range(6, -1, -1):
        out = jnp.where(rd == v, table[v], out)
    return out


def _make_kernel(channels: int):
    def kernel(seed_ref, tl_ref, tr_ref, bl_ref, br_ref,
               sub1_ref, sub2_ref, sel1_ref, sel2_ref):
        plane = pl.program_id(0)
        image = plane // channels  # same seed for all channel planes
        pltpu.prng_seed(seed_ref[0] + image)

        h2, w2 = sel1_ref.shape[1], sel1_ref.shape[2]
        bits = pltpu.prng_random_bits((h2, w2))
        rd = jax.lax.convert_element_type(
            pltpu.bitcast(bits, jnp.uint32) % jnp.uint32(8), jnp.int32
        )

        pos1 = _lut(rd, _POS1)
        pos2 = _lut(rd, _POS2)
        sel1_ref[0] = pos1
        sel2_ref[0] = pos2

        tl, tr, bl, br = tl_ref[0], tr_ref[0], bl_ref[0], br_ref[0]
        sub1_ref[0] = _select_pos(pos1, tl, tr, bl, br)
        sub2_ref[0] = _select_pos(pos2, tl, tr, bl, br)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def subsample_pair_pallas(seed, img, interpret: bool = False):
    """img: NHWC with even H, W. seed: int32 scalar.

    Returns (sub1, sub2, (sel1, sel2)) matching ops.neighbor.subsample_pair's
    contract (sub-images [N,H/2,W/2,C]; selectors int32 [N,H/2,W/2]).
    """
    n, h, w, c = img.shape
    h2, w2 = h // 2, w // 2
    # [N,H,W,C] → channel-major planes [N·C, H/2, 2, W/2, 2]
    planes = jnp.transpose(img, (0, 3, 1, 2)).reshape(n * c, h2, 2, w2, 2)
    tl = planes[:, :, 0, :, 0]
    tr = planes[:, :, 0, :, 1]
    bl = planes[:, :, 1, :, 0]
    br = planes[:, :, 1, :, 1]

    block = lambda: pl.BlockSpec((1, h2, w2), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    sub1, sub2, sel1, sel2 = pl.pallas_call(
        _make_kernel(c),
        grid=(n * c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block(), block(), block(), block(),
        ],
        out_specs=(block(), block(), block(), block()),
        out_shape=(
            jax.ShapeDtypeStruct((n * c, h2, w2), img.dtype),
            jax.ShapeDtypeStruct((n * c, h2, w2), img.dtype),
            jax.ShapeDtypeStruct((n * c, h2, w2), jnp.int32),
            jax.ShapeDtypeStruct((n * c, h2, w2), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), tl, tr, bl, br)

    sub1 = jnp.transpose(sub1.reshape(n, c, h2, w2), (0, 2, 3, 1))
    sub2 = jnp.transpose(sub2.reshape(n, c, h2, w2), (0, 2, 3, 1))
    # identical across channels — keep channel 0's map
    sel1 = sel1.reshape(n, c, h2, w2)[:, 0]
    sel2 = sel2.reshape(n, c, h2, w2)[:, 0]
    return sub1, sub2, (sel1, sel2)
