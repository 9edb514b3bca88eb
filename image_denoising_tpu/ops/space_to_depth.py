"""Space-to-depth as pure reshape/transpose (no im2col buffer).

The reference implements this with ATen ``unfold`` (``train.py:134-138``);
on TPU a reshape/transpose compiles to a layout change XLA can fuse away.

Channel ordering matches torch unfold for NCHW input converted to NHWC:
output channel index = c·4 + kh·2 + kw, i.e. per input channel the 2×2 cell
is flattened [TL, TR, BL, BR].
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space"]


def space_to_depth(x, block_size: int = 2):
    """NHWC [N,H,W,C] → [N,H/b,W/b,C·b²] with (c, kh, kw) channel order."""
    n, h, w, c = x.shape
    b = block_size
    x = x.reshape(n, h // b, b, w // b, b, c)
    # → (n, h/b, w/b, c, kh, kw)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(n, h // b, w // b, c * b * b)


def depth_to_space(x, block_size: int = 2):
    """Inverse of :func:`space_to_depth`."""
    n, hb, wb, cb = x.shape
    b = block_size
    c = cb // (b * b)
    x = x.reshape(n, hb, wb, c, b, b)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # n, h/b, kh, w/b, kw, c
    return x.reshape(n, hb * b, wb * b, c)
