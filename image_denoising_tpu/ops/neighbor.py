"""Neighbor2Neighbor random sub-sampler, TPU-native.

Reference semantics (``train.py:141-190``): for every 2×2 cell, draw one of 8
ordered neighbor pairs uniformly; sub-image 1 takes the cell value at the
pair's first position, sub-image 2 at the second. The torch implementation
materializes two boolean masks over a flattened n·(h/2)·(w/2)·4 vector and
does masked gathers per channel.

The TPU formulation avoids boolean masks and data-dependent shapes entirely:
reshape into cells [N,H/2,W/2,4,C], draw rd ∈ [0,8) per cell, look the pair up
in a constant LUT and ``take_along_axis`` over the 4-position axis. One fused
gather per sub-image, identical distribution, same pair choice shared across
channels (as in the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["generate_mask_pair", "generate_subimages", "subsample_pair"]

# The 8 ordered neighbor pairs of train.py:151-154; positions index the
# flattened 2×2 cell [TL, TR, BL, BR].
_IDX_PAIR = jnp.array(
    [[0, 1], [0, 2], [1, 3], [2, 3], [1, 0], [2, 0], [3, 1], [3, 2]],
    dtype=jnp.int32,
)


def _cells(img):
    """NHWC → [N, H/2, W/2, 4, C] with cell order [TL, TR, BL, BR]."""
    n, h, w, c = img.shape
    x = img.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # n, h2, w2, kh, kw, c
    return x.reshape(n, h // 2, w // 2, 4, c)


def generate_mask_pair(key, img_shape):
    """Draw the per-cell pair choice; returns (sel1, sel2), each [N,H/2,W/2].

    sel1/sel2 hold the chosen cell positions (0..3) — the dense-index
    equivalent of the reference's boolean masks.
    """
    n, h, w, _ = img_shape
    rd = jax.random.randint(key, (n, h // 2, w // 2), 0, 8, dtype=jnp.int32)
    pair = _IDX_PAIR[rd]  # [N,H/2,W/2,2]
    return pair[..., 0], pair[..., 1]


def generate_subimages(img, sel):
    """Gather one pixel per 2×2 cell. img NHWC, sel [N,H/2,W/2] → NHWC half-res."""
    cells = _cells(img)  # [N,h2,w2,4,C]
    idx = sel[..., None, None]  # [N,h2,w2,1,1]
    sub = jnp.take_along_axis(cells, idx, axis=3)
    return sub[..., 0, :]


def subsample_pair(key, img):
    """Convenience: one call → (sub1, sub2) plus the selectors for reuse on
    other images (the denoised target uses the same masks, train recipe
    ``training_script.md:137-144``)."""
    sel1, sel2 = generate_mask_pair(key, img.shape)
    return generate_subimages(img, sel1), generate_subimages(img, sel2), (sel1, sel2)
