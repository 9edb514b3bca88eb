"""Weight initializers reproducing the reference's PyTorch init semantics.

Two regimes exist in the reference (``arch_unet.py``):

* UNet / RESNET / UpsampleCat call ``initialize_weights(m, 0.1)`` —
  Kaiming-normal (fan_in, a=0, gain=√2) scaled by 0.1, biases zeroed
  (``arch_unet.py:24-48``). The last 1×1 head (``nin_c``) is *left at torch
  default* when ``zero_last=True``.
* ImprovedUNet and its blocks never call ``initialize_weights`` — they use
  torch's default ``kaiming_uniform_(a=√5)``: weights ~ U(±1/√fan_in), biases
  ~ U(±1/√fan_in).

All initializers below are expressed for flax NHWC/HWIO kernels; fan_in is
computed from the kernel shape the same way torch does, including torch's
quirk for ConvTranspose2d where fan_in = out_channels · kh · kw (torch
computes fan from ``weight.size(1)`` which is *out* for deconvs).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_normal_scaled",
    "torch_default_conv_kernel",
    "torch_default_bias",
    "zeros_init",
    "constant_init",
]


def _fan_in_hwio(shape) -> int:
    """fan_in for an HWIO conv kernel (kh, kw, in_ch, out_ch)."""
    if len(shape) == 4:
        kh, kw, in_ch, _ = shape
        return int(in_ch * kh * kw)
    if len(shape) == 2:  # dense (in, out) in flax
        return int(shape[0])
    raise ValueError(f"unsupported kernel shape {shape}")


def kaiming_normal_scaled(scale: float = 0.1, fan_in_override=None):
    """Kaiming-normal fan_in (gain √2), times ``scale``.

    ``fan_in_override(shape) -> int`` lets deconvs reproduce torch's
    out-channel-based fan (see module docstring).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = fan_in_override(shape) if fan_in_override else _fan_in_hwio(shape)
        std = np.sqrt(2.0 / fan_in) * scale
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def torch_default_conv_kernel():
    """torch Conv2d/Linear default: kaiming_uniform_(a=√5) → U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = _fan_in_hwio(shape)
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_bias(fan_in: int):
    """torch conv/linear default bias: U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def zeros_init():
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)

    return init


def constant_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
