"""Pool-free RESNET variant: full-resolution conv stack with skip concats and
a global residual ``out = head(x) + input`` (reference ``arch_unet.py:263-409``).

Same init/activation regime as UNet; supports the blind-spot rotation path.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    Conv,
    blindspot_conv,
    blindspot_output_shift,
    leaky_relu,
    rotate,
)


class RESNET(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    n_feature: int = 48
    blindspot: bool = False
    zero_last: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, in_):
        bs = self.blindspot
        nf = self.n_feature
        dt = self.dtype

        def conv(name, feats, kernel=3, init="kaiming01"):
            mod = Conv(feats, kernel=kernel, init=init, dtype=dt, name=name)
            return lambda h: blindspot_conv(h, mod, kernel, bs)

        act = leaky_relu
        x = in_
        if bs:
            x = jnp.concatenate([rotate(x, a) for a in (0, 90, 180, 270)], axis=0)

        pool0 = x
        x = act(conv("enc_conv0", nf)(x))
        x = act(conv("enc_conv1", nf)(x))
        pool1 = x

        x = act(conv("enc_conv2", nf)(x))
        pool2 = x

        x = act(conv("enc_conv3", nf)(x))
        pool3 = x

        x = act(conv("enc_conv4", nf)(x))
        pool4 = x

        x = act(conv("enc_conv5", nf)(x))
        x = act(conv("enc_conv6", nf)(x))

        x = jnp.concatenate([x, pool4], axis=-1)
        x = act(conv("dec_conv5a", nf * 2)(x))
        x = act(conv("dec_conv5b", nf * 2)(x))

        x = jnp.concatenate([x, pool3], axis=-1)
        x = act(conv("dec_conv4a", nf * 2)(x))
        x = act(conv("dec_conv4b", nf * 2)(x))

        x = jnp.concatenate([x, pool2], axis=-1)
        x = act(conv("dec_conv3a", nf * 2)(x))
        x = act(conv("dec_conv3b", nf * 2)(x))

        x = jnp.concatenate([x, pool1], axis=-1)
        x = act(conv("dec_conv2a", nf * 2)(x))
        x = act(conv("dec_conv2b", nf * 2)(x))

        x = jnp.concatenate([x, pool0], axis=-1)

        nin_c_init = "torch" if self.zero_last else "kaiming01"
        x = act(conv("dec_conv1a", 96)(x))
        x = act(conv("dec_conv1b", 96)(x))
        if bs:
            x = blindspot_output_shift(x)
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
        return x + in_
