"""Fused-kernel inference forward for ImprovedUNet.

``improved_unet_fused_apply(params, x)`` computes exactly what
``ImprovedUNet.apply`` computes (models/improved_unet.py, reference
``arch_unet.py:475-531``) but routes every level's
lead-conv→RDB→ResBlock-conv0 chain through the VMEM-resident Pallas kernel
(ops/fused_block_pallas.py) — the HBM-traffic fix named by the round-2
roofline analysis (docs/PERF.md §5). It takes the SAME param pytree as the
flax module, so checkpoints are interchangeable and parity is testable
leaf-for-leaf.

Split of labor per level block:
* Pallas: lead conv (+LReLU), the 4 dense growth convs + LFF + residual
  (concat never materializes), ResBlock conv0 — 7 of the 9 convs.
* XLA: GroupNorm (needs full-frame stats — two cheap elementwise passes),
  LReLU, ResBlock conv1 + GN1 + residual, maxpool, PixelShuffle convs,
  noise estimator, final conv. XLA already fuses these well; they are a
  minority of the FLOPs.

Inference-only (no custom VJP): the training path keeps the flax forward.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_block_pallas import FusedChainWeights, fused_rdb_chain
from .layers import gn_groups, leaky_relu, max_pool_2x2, pixel_shuffle

__all__ = ["improved_unet_fused_apply", "make_fused_forward"]


def _conv(x, p, *, stride=1):
    """SAME 2-D conv from a flax Conv param dict ({'conv': {kernel, bias}})."""
    w = p["conv"]["kernel"].astype(x.dtype)
    k = w.shape[0]
    out = lax.conv_general_dilated(
        x, w, (stride, stride), "SAME" if k > 1 else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p["conv"]:
        out = out + p["conv"]["bias"].astype(x.dtype)
    return out


def _group_norm(x, p, channels: int, eps: float = 1e-5):
    """GroupNorm with the reference group-count fallback; stats in f32."""
    g = gn_groups(channels)
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=(1, 2, 4), keepdims=True)
    xn = ((xf - mean) * lax.rsqrt(var + eps)).reshape(b, h, w, c)
    scale = p["gn"]["scale"].astype(jnp.float32)
    bias = p["gn"]["bias"].astype(jnp.float32)
    return (xn * scale + bias).astype(x.dtype)


def _res_tail(rdb_out, c0, res_p, nf: int):
    """ResBlock minus conv0 (which the fused chain already produced):
    GN0 → LReLU → conv1 → GN1 → + rdb_out."""
    h = _group_norm(c0, res_p["norm0"], nf)
    h = leaky_relu(h)
    h = _conv(h, res_p["conv1"])
    h = _group_norm(h, res_p["norm1"], nf)
    return rdb_out + h


def improved_unet_fused_apply(
    params,
    x,
    *,
    in_nc: int = 1,
    n_feature: int = 48,
    depth: int = 4,
    noise: bool = True,
    compute_dtype: Any = jnp.float32,
    s_rows: Optional[int] = None,
    interpret: bool = False,
):
    """params: the ImprovedUNet flax param tree. x: [B,H,W,in_nc] in [0,1]."""
    dt = compute_dtype
    x = x.astype(dt)
    if noise:
        h = leaky_relu(_conv(x, params["noise_est_conv0"]))
        sigma = jax.nn.sigmoid(_conv(h, params["noise_est_conv1"]))
        x = jnp.concatenate([x, sigma], axis=-1)
    orig = x[..., :in_nc]

    chain = partial(fused_rdb_chain, compute_dtype=dt, s_rows=s_rows,
                    interpret=interpret)

    skips = []
    nf = n_feature
    for i in range(depth):
        wts = FusedChainWeights(params, lead=f"down{i}_conv",
                                rdb=f"down{i}_rdb", res=f"down{i}_res",
                                dtype=dt)
        rdb_out, c0 = chain(x, wts)
        x = _res_tail(rdb_out, c0, params[f"down{i}_res"], nf)
        skips.append(x)
        x = max_pool_2x2(x)
        nf *= 2

    nf //= 2
    wts = FusedChainWeights(params, lead=None, rdb="bottle_rdb",
                            res="bottle_res", dtype=dt)
    rdb_out, c0 = chain(x, wts)
    x = _res_tail(rdb_out, c0, params["bottle_res"], nf)

    for i in range(depth):
        nf //= 2
        up = params[f"up{i}"]
        x = _conv(x, up["conv_ps"])
        x = pixel_shuffle(x, 2)
        x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
        wts = FusedChainWeights(up, lead="fuse", rdb="rdb", res="res", dtype=dt)
        rdb_out, c0 = chain(x, wts)
        x = _res_tail(rdb_out, c0, up["res"], nf)

    x = jnp.concatenate([x, orig], axis=-1)
    x = _conv(x, params["final"])
    return jax.nn.sigmoid(x)


def make_fused_forward(model, params=None, **kw):
    """Adapt an ImprovedUNet module's static config to the fused apply.

    Returns ``fwd(params, x)`` with the same contract as
    ``lambda p, x: model.apply({"params": p}, x)``.
    """
    cfg = dict(
        in_nc=model.in_nc, n_feature=model.n_feature, depth=model.depth,
        noise=model.noise,
        compute_dtype=model.dtype or jnp.float32,
    )
    cfg.update(kw)

    def fwd(params, x):
        return improved_unet_fused_apply(params, x, **cfg)

    return fwd
