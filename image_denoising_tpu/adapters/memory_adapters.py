"""The five memory-conditioned adapter variants.

Reference semantics (``finetune_memory.py:530-1192``), all operating on
(noisy, base_out, mem_clean) NHWC [0,1] triples:

v1 MemoryResidualAdapter      — 3-conv CNN on concat of all three, zero-init
                                last conv (identity at init), out = base+δ.
v2 LowFrequencyBlendAdapter   — fixed 9×9 σ=3 Gaussian depthwise low-pass;
                                1×1 gate net on the three low-pass maps
                                (zero-init last conv, bias −2); output
                                HP_base + (1−g)·LP_base + g·LP_mem, clamp.
v3 GlobalMonotoneToneCurve    — MLP(6 global mean/std feats) → K−1 softplus
                                slopes → cumsum → normalized monotone curve
                                applied to base_out via floor/gather/lerp;
                                identity init (zero weights, softplus⁻¹(1)
                                last bias).
v4 HyperGatedResidualAdapter  — local 3-conv CNN sees only [noisy, base_out]
                                (zero-init last); hyper-MLP(6 feats) →
                                per-channel γ=sigmoid, β=0.1·tanh (all-zero
                                init → γ=0.5, β=0); out = base + γ·r + β.
v5 HyperGatedResidualAdapterFFT (active default) — v4 + row-wise rFFT power
                                binned into 3 bands per input (log1p,
                                per-sample mean-normalized) → hyper input
                                dim 6 + 3·3 = 15.

torch std semantics note: the reference uses ``Tensor.std`` (Bessel,
ddof=1) for the global features — reproduced here.
"""
from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..models.init import constant_init, zeros_init
from ..models.layers import Conv

__all__ = [
    "MemoryResidualAdapter",
    "LowFrequencyBlendAdapter",
    "GlobalMonotoneToneCurveAdapter",
    "HyperGatedResidualAdapter",
    "HyperGatedResidualAdapterFFT",
    "MEMORY_ADAPTERS",
    "build_memory_adapter",
]


def _global_mean_std(x):
    """[B,H,W,C] → (mean, std) each [B]; std is Bessel-corrected like torch."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    mean = flat.mean(axis=1)
    n = flat.shape[1]
    var = jnp.sum((flat - mean[:, None]) ** 2, axis=1) / (n - 1)
    return mean, jnp.sqrt(var)


class _ZeroLastConvBody(nn.Module):
    """Conv stack with ReLUs and a zero-initialized final conv."""

    hidden: int
    out_ch: int
    n_hidden_layers: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_hidden_layers):
            x = Conv(self.hidden, init="torch", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = Conv(self.out_ch, init="zeros", dtype=self.dtype,
                 name=f"conv{self.n_hidden_layers}")(x)
        return x


class MemoryResidualAdapter(nn.Module):
    in_channels: int = 1
    hidden_channels: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, noisy, base_out, mem_clean):
        x = jnp.concatenate([noisy, base_out, mem_clean], axis=-1)
        delta = _ZeroLastConvBody(
            self.hidden_channels, self.in_channels, dtype=self.dtype, name="body"
        )(x)
        return base_out + delta


def _gaussian_kernel2d(k: int, sigma: float) -> np.ndarray:
    ax = np.arange(k, dtype=np.float32) - (k - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax, indexing="ij")
    kernel = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return (kernel / kernel.sum()).astype(np.float32)


class LowFrequencyBlendAdapter(nn.Module):
    in_channels: int = 1
    hidden_channels: int = 16
    kernel_size: int = 9
    sigma: float = 3.0
    clamp_output: bool = True
    dtype: Optional[Any] = None

    def _lowpass(self, x):
        from jax import lax

        k = self.kernel_size
        # conv requires matching dtypes; the fixed Gaussian runs in the
        # incoming compute dtype (bf16-safe, regression-tested)
        x = jnp.asarray(x)
        kern = jnp.asarray(_gaussian_kernel2d(k, self.sigma), x.dtype)
        c = x.shape[-1]
        w = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
        return lax.conv_general_dilated(
            x, w, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    @nn.compact
    def __call__(self, noisy, base_out, mem_clean):
        lp_noisy = self._lowpass(noisy)
        lp_base = self._lowpass(base_out)
        lp_mem = self._lowpass(mem_clean)
        hp_base = base_out - lp_base

        gate_in = jnp.concatenate([lp_noisy, lp_base, lp_mem], axis=-1)
        h = Conv(self.hidden_channels, kernel=1, init="torch", dtype=self.dtype,
                 name="gate_conv0")(gate_in)
        h = nn.relu(h)
        # zero weights, bias −2 → g ≈ 0.12 at init (finetune_memory.py:623-626)
        g = nn.Conv(
            self.in_channels, (1, 1), padding="VALID",
            kernel_init=zeros_init(), bias_init=constant_init(-2.0),
            dtype=self.dtype, name="gate_conv1",
        )(h)
        g = nn.sigmoid(g)

        out = hp_base + (1.0 - g) * lp_base + g * lp_mem
        if self.clamp_output:
            out = jnp.clip(out, 0.0, 1.0)
        return out


class GlobalMonotoneToneCurveAdapter(nn.Module):
    in_channels: int = 1
    hidden_dim: int = 16
    num_ctrl_points: int = 8
    clamp_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, noisy, base_out, mem_clean):
        k = self.num_ctrl_points
        mean_n, std_n = _global_mean_std(noisy)
        mean_b, std_b = _global_mean_std(base_out)
        mean_m, std_m = _global_mean_std(mem_clean)
        feats = jnp.stack([mean_n, std_n, mean_b, std_b, mean_m, std_m], axis=1)

        h = nn.Dense(self.hidden_dim, kernel_init=zeros_init(),
                     bias_init=zeros_init(), name="mlp0")(feats)
        h = nn.relu(h)
        raw_bias = math.log(math.exp(1.0) - 1.0)  # softplus⁻¹(1)
        raw = nn.Dense(k - 1, kernel_init=zeros_init(),
                       bias_init=constant_init(raw_bias), name="mlp1")(h)
        slopes = nn.softplus(raw) + 1e-4

        delta_y = slopes * (1.0 / (k - 1))
        y_rest = jnp.cumsum(delta_y, axis=1)
        y0 = jnp.zeros((feats.shape[0], 1), feats.dtype)
        y_unscaled = jnp.concatenate([y0, y_rest], axis=1)  # [B,K]
        y_end = jnp.clip(y_unscaled[:, -1:], 1e-6)
        y_vals = y_unscaled / y_end

        x = jnp.clip(base_out, 0.0, 1.0)
        pos = jnp.clip(x * (k - 1), 0.0, k - 1 - 1e-6)
        idx0 = jnp.floor(pos).astype(jnp.int32)
        idx1 = jnp.minimum(idx0 + 1, k - 1)
        t = pos - idx0.astype(pos.dtype)
        yv = y_vals[:, None, None, None, :]  # [B,1,1,1,K]
        y0v = jnp.take_along_axis(
            jnp.broadcast_to(yv, base_out.shape + (k,)), idx0[..., None], axis=-1
        )[..., 0]
        y1v = jnp.take_along_axis(
            jnp.broadcast_to(yv, base_out.shape + (k,)), idx1[..., None], axis=-1
        )[..., 0]
        out = y0v + (y1v - y0v) * t
        if self.clamp_output:
            out = jnp.clip(out, 0.0, 1.0)
        return out


class _HyperMLP(nn.Module):
    """Zero-initialized hyper-network → per-channel (γ, β)."""

    hidden: int
    channels: int
    beta_scale: float = 0.1

    @nn.compact
    def __call__(self, feats):
        h = nn.Dense(self.hidden, kernel_init=zeros_init(),
                     bias_init=zeros_init(), name="hyper0")(feats)
        h = nn.relu(h)
        hyper = nn.Dense(2 * self.channels, kernel_init=zeros_init(),
                         bias_init=zeros_init(), name="hyper1")(h)
        c = self.channels
        gamma = nn.sigmoid(hyper[:, :c])
        beta = self.beta_scale * jnp.tanh(hyper[:, c:])
        b = feats.shape[0]
        return gamma.reshape(b, 1, 1, c), beta.reshape(b, 1, 1, c)


class HyperGatedResidualAdapter(nn.Module):
    in_channels: int = 1
    hidden_channels: int = 16
    clamp_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, noisy, base_out, mem_clean):
        local_in = jnp.concatenate([noisy, base_out], axis=-1)
        r = _ZeroLastConvBody(
            self.hidden_channels, self.in_channels, dtype=self.dtype, name="local"
        )(local_in)

        mean_n, std_n = _global_mean_std(noisy)
        mean_b, std_b = _global_mean_std(base_out)
        mean_m, std_m = _global_mean_std(mem_clean)
        feats = jnp.stack([mean_n, std_n, mean_b, std_b, mean_m, std_m], axis=1)
        gamma, beta = _HyperMLP(self.hidden_channels, self.in_channels, name="hyper")(feats)

        out = base_out + gamma * r + beta
        if self.clamp_output:
            out = jnp.clip(out, 0.0, 1.0)
        return out


def row_fft_features(x, num_bins: int = 3):
    """[B,H,W,C] → [B,num_bins] — row-wise rFFT power band means, log1p,
    per-sample mean-normalized (finetune_memory.py:1077-1116)."""
    b, h, w, c = x.shape
    # torch reshapes NCHW to [B, C·H, W]; rows are rows either way.
    # XLA's RFFT is f32-only — promote in case the base ran in bf16.
    rows = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * h, w)
    rows = rows.astype(jnp.float32)
    spec = jnp.fft.rfft(rows, axis=-1)
    power = spec.real**2 + spec.imag**2
    power_mean = power.mean(axis=1)  # [B, F]

    freq = power_mean.shape[-1]
    bin_size = freq // num_bins
    feats = []
    for k in range(num_bins):
        start = k * bin_size
        end = (k + 1) * bin_size if k < num_bins - 1 else freq
        feats.append(power_mean[:, start:end].mean(axis=-1))
    feats = jnp.stack(feats, axis=1)
    feats = jnp.log1p(feats)
    return feats / (feats.mean(axis=1, keepdims=True) + 1e-6)


class HyperGatedResidualAdapterFFT(nn.Module):
    in_channels: int = 1
    hidden_channels: int = 16
    num_fft_bins: int = 3
    clamp_output: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, noisy, base_out, mem_clean):
        local_in = jnp.concatenate([noisy, base_out], axis=-1)
        r = _ZeroLastConvBody(
            self.hidden_channels, self.in_channels, dtype=self.dtype, name="local"
        )(local_in)

        mean_n, std_n = _global_mean_std(noisy)
        mean_b, std_b = _global_mean_std(base_out)
        mean_m, std_m = _global_mean_std(mem_clean)
        feats = jnp.concatenate(
            [
                jnp.stack([mean_n, std_n, mean_b, std_b, mean_m, std_m], axis=1),
                row_fft_features(noisy, self.num_fft_bins),
                row_fft_features(base_out, self.num_fft_bins),
                row_fft_features(mem_clean, self.num_fft_bins),
            ],
            axis=1,
        )
        gamma, beta = _HyperMLP(self.hidden_channels, self.in_channels, name="hyper")(feats)

        out = base_out + gamma * r + beta
        if self.clamp_output:
            out = jnp.clip(out, 0.0, 1.0)
        return out


MEMORY_ADAPTERS = {
    "memory_residual": MemoryResidualAdapter,
    "lowfreq_blend": LowFrequencyBlendAdapter,
    "tone_curve": GlobalMonotoneToneCurveAdapter,
    "hyper_gated": HyperGatedResidualAdapter,
    "hyper_gated_fft": HyperGatedResidualAdapterFFT,
}


def build_memory_adapter(variant: str, in_channels: int, hidden_channels: int,
                         dtype=None, name=None):
    """v1..v5 by name; 'hyper_gated_fft' (v5) is the reference's active pick."""
    if variant not in MEMORY_ADAPTERS:
        raise ValueError(f"unknown adapter variant {variant!r} "
                         f"(choose from {sorted(MEMORY_ADAPTERS)})")
    cls = MEMORY_ADAPTERS[variant]
    kwargs = {"in_channels": in_channels, "dtype": dtype}
    if variant == "tone_curve":
        kwargs["hidden_dim"] = hidden_channels
    else:
        kwargs["hidden_channels"] = hidden_channels
    if name is not None:
        kwargs["name"] = name
    return cls(**kwargs)
