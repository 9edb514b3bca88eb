"""Residual output adapter for the frozen-base finetune path.

Reference semantics (``adapter.py:5-26``): a 2-conv CNN over
concat[noisy, base_out] (2C→hidden→C, ReLU between, torch default init);
returns ``base_out + delta``.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..models.layers import Conv


class OutputAdapter(nn.Module):
    in_channels: int = 1
    hidden_channels: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, noisy, base_out):
        x = jnp.concatenate([noisy, base_out], axis=-1)
        x = Conv(self.hidden_channels, init="torch", dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        delta = Conv(self.in_channels, init="torch", dtype=self.dtype, name="conv1")(x)
        return base_out + delta
