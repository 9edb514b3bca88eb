"""N2N-style UNet backbone with optional blind-spot mode.

Capability parity with the reference ``arch_unet.py:100-260``: a 5-level
encoder of 48-ch 3×3 convs + 2×2 maxpools, transpose-conv decoder with skip
concatenation, a 96-ch NIN head, LeakyReLU(0.2) everywhere, Kaiming·0.1 init,
and — when ``blindspot=True`` — the 4-rotation stack with shifted convs/pools
and a 4-way NIN merge.

TPU-native design: NHWC layout, all four rotations processed as one batch
(single conv dispatch), shapes static under jit.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    Conv,
    Deconv2x2,
    blindspot_conv,
    blindspot_output_shift,
    blindspot_pool,
    leaky_relu,
    rotate,
)


class UpsampleCat(nn.Module):
    """2×2 stride-2 deconv then channel concat (arch_unet.py:51-62)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1, x2):
        x1 = Deconv2x2(self.features, dtype=self.dtype, name="deconv")(x1)
        return jnp.concatenate([x1, x2], axis=-1)


class UNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    n_feature: int = 48
    blindspot: bool = False
    zero_last: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        bs = self.blindspot
        nf = self.n_feature
        dt = self.dtype
        h, w = x.shape[1], x.shape[2]
        if h % 32 or w % 32:
            raise ValueError(
                f"UNet needs H and W divisible by 32 (5 pool levels); got "
                f"({h},{w}). The torch reference has the same constraint (its "
                f"decoder concat fails on odd pooled dims). For N2N training "
                f"the 2x2 subsampler halves the frame, so frames must be "
                f"divisible by 64."
            )

        def conv(name, feats, kernel=3, init="kaiming01"):
            mod = Conv(feats, kernel=kernel, init=init, dtype=dt, name=name)
            return lambda h: blindspot_conv(h, mod, kernel, bs)

        act = leaky_relu

        if bs:
            x = jnp.concatenate([rotate(x, a) for a in (0, 90, 180, 270)], axis=0)

        pool0 = x
        x = act(conv("enc_conv0", nf)(x))
        x = act(conv("enc_conv1", nf)(x))
        x = blindspot_pool(x, bs)
        pool1 = x

        x = act(conv("enc_conv2", nf)(x))
        x = blindspot_pool(x, bs)
        pool2 = x

        x = act(conv("enc_conv3", nf)(x))
        x = blindspot_pool(x, bs)
        pool3 = x

        x = act(conv("enc_conv4", nf)(x))
        x = blindspot_pool(x, bs)
        pool4 = x

        x = act(conv("enc_conv5", nf)(x))
        x = blindspot_pool(x, bs)

        x = act(conv("enc_conv6", nf)(x))

        x = UpsampleCat(nf, dtype=dt, name="up5")(x, pool4)
        x = act(conv("dec_conv5a", nf * 2)(x))
        x = act(conv("dec_conv5b", nf * 2)(x))

        x = UpsampleCat(nf * 2, dtype=dt, name="up4")(x, pool3)
        x = act(conv("dec_conv4a", nf * 2)(x))
        x = act(conv("dec_conv4b", nf * 2)(x))

        x = UpsampleCat(nf * 2, dtype=dt, name="up3")(x, pool2)
        x = act(conv("dec_conv3a", nf * 2)(x))
        x = act(conv("dec_conv3b", nf * 2)(x))

        x = UpsampleCat(nf * 2, dtype=dt, name="up2")(x, pool1)
        x = act(conv("dec_conv2a", nf * 2)(x))
        x = act(conv("dec_conv2b", nf * 2)(x))

        x = UpsampleCat(nf * 2, dtype=dt, name="up1")(x, pool0)

        nin_c_init = "torch" if self.zero_last else "kaiming01"
        x = act(conv("dec_conv1a", 96)(x))
        x = act(conv("dec_conv1b", 96)(x))
        if bs:
            x = blindspot_output_shift(x)
            n4 = x.shape[0]
            parts = jnp.split(x, 4, axis=0)
            parts = [rotate(y, a) for y, a in zip(parts, (0, 270, 180, 90))]
            x = jnp.concatenate(parts, axis=-1)
            x = act(conv("nin_a", 96 * 4, kernel=1)(x))
            x = act(conv("nin_b", 96, kernel=1)(x))
            x = conv("nin_c", self.out_nc, kernel=1, init=nin_c_init)(x)
        else:
            x = act(conv("nin_a", 96, kernel=1)(x))
            x = act(conv("nin_b", 96, kernel=1)(x))
            x = conv("nin_c", self.out_nc, kernel=1, init=nin_c_init)(x)
        return x
