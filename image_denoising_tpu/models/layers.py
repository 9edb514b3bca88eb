"""Shared NHWC layer primitives for the model zoo.

These reproduce the reference building blocks (``arch_unet.py:7-97,422-472``)
with TPU-idiomatic implementations:

* 2×2 stride-2 deconv (``UpsampleCat``) is a single matmul + reshape instead of
  a conv_transpose — exact for kernel==stride and MXU-friendly,
* PixelShuffle is a reshape/transpose with torch's (C', r, r) channel order,
* max-pool is a ``lax.reduce_window`` (floor semantics on odd dims, like torch),
* the blind-spot shifts (pad-top / crop-bottom) follow ``arch_unet.py:65-97``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from .init import (
    kaiming_normal_scaled,
    torch_default_bias,
    torch_default_conv_kernel,
    zeros_init,
)

Dtype = Any

LEAKY_SLOPE = 0.2


def leaky_relu(x):
    """LeakyReLU(0.2) as max(x, 0.2·x) — forward-identical to the where-based
    form for any slope in [0,1], but XLA/TPU fuses the maximum into the
    producing conv's epilogue where the compare+select lowering of
    ``nn.leaky_relu`` stays a standalone kernel (a full HBM round trip per
    activation; measured 47% of device time on the tiled-eval profile,
    docs/PERF.md).

    Gradient caveat at exactly x == 0: jnp.maximum splits ties 0.5/0.5 so
    d/dx = 0.6, vs 1.0 for jax.nn.leaky_relu and 0.2 for torch's LeakyReLU.
    Measure-zero for real conv activations (forward parity tests pass
    bit-level), but it IS a deviation — if a parity hunt ever lands here,
    this is why."""
    return jnp.maximum(x, LEAKY_SLOPE * x)


def gn_groups(channels: int, groups: int = 32) -> int:
    """Group count with the reference's divisibility fallback (arch_unet.py:12-14)."""
    g = min(groups, channels)
    while channels % g != 0 and g > 1:
        g -= 1
    return g


class Conv(nn.Module):
    """3×3/1×1 conv with torch-compatible init regimes.

    init='kaiming01' → Kaiming-normal·0.1, bias zero (UNet/RESNET regime)
    init='torch'     → torch default kaiming_uniform(a=√5) (ImprovedUNet regime)
    """

    features: int
    kernel: int = 3
    use_bias: bool = True
    init: str = "kaiming01"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel * self.kernel
        if self.init == "kaiming01":
            kinit = kaiming_normal_scaled(0.1)
            binit = zeros_init()
        elif self.init == "torch":
            kinit = torch_default_conv_kernel()
            binit = torch_default_bias(fan_in)
        elif self.init == "zeros":
            kinit = zeros_init()
            binit = zeros_init()
        else:
            raise ValueError(f"unknown init regime {self.init!r}")
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME" if self.kernel > 1 else "VALID",
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
            name="conv",
        )(x)


def max_pool_2x2(x):
    """torch MaxPool2d(2): floor semantics (odd trailing row/col dropped)."""
    n, h, w, c = x.shape
    x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ).astype(x.dtype)


class Deconv2x2(nn.Module):
    """ConvTranspose2d(in, out, k=2, s=2) as matmul + pixel expansion.

    Kernel stored in torch layout (in, out, 2, 2) so .pth import is a straight
    copy. torch computes fan_in for deconvs from weight.size(1)·k·k = out·4.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out_ch = self.features
        kinit = kaiming_normal_scaled(0.1, fan_in_override=lambda s: s[1] * 4)
        kernel = self.param("kernel", kinit, (in_ch, out_ch, 2, 2))
        bias = self.param("bias", zeros_init(), (out_ch,))
        k = kernel.astype(self.dtype) if self.dtype else kernel
        xd = x.astype(self.dtype) if self.dtype else x
        # y[n, 2i+di, 2j+dj, o] = Σ_c x[n,i,j,c]·W[c,o,di,dj]
        y = jnp.einsum("nhwc,codx->nhdwxo", xd, k)
        n, h, _, w, _, o = y.shape
        y = y.reshape(n, h * 2, w * 2, o)
        return y + bias.astype(y.dtype)


def pixel_shuffle(x, r: int = 2):
    """torch PixelShuffle channel order: c_in = c_out·r² + i·r + j (NHWC)."""
    n, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # n, h, i, w, j, c_out
    return x.reshape(n, h * r, w * r, c_out)


def rotate(x, angle: int):
    """torch.rot90(x, k, dims=(3,2)) on NHWC → rot90 over axes (2,1)."""
    if angle == 0:
        return x
    k = {90: 1, 180: 2, 270: 3}[angle]
    return jnp.rot90(x, k=k, axes=(2, 1))


def blindspot_conv(x, conv_fn: Callable, kernel: int, blindspot: bool):
    """conv_func (arch_unet.py:65-78): pad top k//2, conv SAME, crop bottom."""
    if not blindspot or kernel == 1:
        return conv_fn(x)
    ofs = kernel // 2
    x = jnp.pad(x, ((0, 0), (ofs, 0), (0, 0), (0, 0)))
    x = conv_fn(x)
    return x[:, :-ofs, :, :]


def blindspot_pool(x, blindspot: bool):
    """pool_func (arch_unet.py:81-86): shift rows down by 1, then maxpool."""
    if blindspot:
        x = jnp.pad(x[:, :-1, :, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
    return max_pool_2x2(x)


def blindspot_output_shift(x):
    """Row shift before the 4-way merge (arch_unet.py:246-247)."""
    return jnp.pad(x[:, :-1, :, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
