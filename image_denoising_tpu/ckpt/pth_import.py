"""Import PyTorch ``.pth`` state dicts from the reference into flax params.

Layout conventions:
* torch Conv2d weight OIHW → flax HWIO (transpose 2,3,1,0),
* torch ConvTranspose2d weight (in,out,kh,kw) → our Deconv2x2 kernel verbatim,
* torch GroupNorm weight/bias → flax GroupNorm scale/bias,
* torch Linear weight (out,in) → flax Dense kernel (in,out).

``module.``-prefixed (DataParallel) checkpoints are normalized first, matching
the reference loader (``finetune.py:207-218``).

Key maps cite the reference modules they mirror so parity is auditable:
UNet/RESNET ``arch_unet.py:100-409``, ImprovedUNet ``arch_unet.py:422-531``.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["load_state_dict", "import_pth"]


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy arrays (CPU, no grad), stripping 'module.'."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if any(k.startswith("module.") for k in state):
        state = {k.replace("module.", "", 1): v for k, v in state.items()}
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _conv(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return {"conv": out}


def _deconv(sd, prefix):
    return {"deconv": {"kernel": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _gn(sd, prefix):
    return {"gn": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _dense(sd, prefix):
    return {"kernel": np.transpose(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _rdb(sd, prefix, layers=4):
    p = {f"conv{i}": _conv(sd, f"{prefix}.convs.{i}") for i in range(layers)}
    p["lff"] = _conv(sd, f"{prefix}.lff")
    return p


def _resblock(sd, prefix):
    return {
        "conv0": _conv(sd, f"{prefix}.block.0", bias=False),
        "norm0": _gn(sd, f"{prefix}.block.1"),
        "conv1": _conv(sd, f"{prefix}.block.3", bias=False),
        "norm1": _gn(sd, f"{prefix}.block.4"),
    }


def _upblock(sd, prefix):
    return {
        "conv_ps": _conv(sd, f"{prefix}.conv_ps"),
        "fuse": _conv(sd, f"{prefix}.fuse"),
        "rdb": _rdb(sd, f"{prefix}.rdb"),
        "res": _resblock(sd, f"{prefix}.res"),
    }


def _unet_like(sd) -> Dict[str, Any]:
    """Shared key map for UNet and RESNET (identical naming in the reference)."""
    p: Dict[str, Any] = {}
    for name in [f"enc_conv{i}" for i in range(7)] + [
        "dec_conv5a", "dec_conv5b", "dec_conv4a", "dec_conv4b",
        "dec_conv3a", "dec_conv3b", "dec_conv2a", "dec_conv2b",
        "dec_conv1a", "dec_conv1b", "nin_a", "nin_b", "nin_c",
    ]:
        p[name] = _conv(sd, name)
    for name in ("up5", "up4", "up3", "up2", "up1"):
        if f"{name}.deconv.weight" in sd:
            p[name] = _deconv(sd, f"{name}.deconv")
    return p


def _improved_unet(sd, depth=4, noise=True) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    if noise:
        p["noise_est_conv0"] = _conv(sd, "noise_estimator.0")
        p["noise_est_conv1"] = _conv(sd, "noise_estimator.2")
    for i in range(depth):
        p[f"down{i}_conv"] = _conv(sd, f"downs.{i}.0")
        p[f"down{i}_rdb"] = _rdb(sd, f"downs.{i}.2")
        p[f"down{i}_res"] = _resblock(sd, f"downs.{i}.3")
    p["bottle_rdb"] = _rdb(sd, "bottle.0")
    p["bottle_res"] = _resblock(sd, "bottle.1")
    for i in range(depth):
        p[f"up{i}"] = _upblock(sd, f"ups.{i}")
    p["final"] = _conv(sd, "final")
    return p


def _output_adapter(sd, prefix="") -> Dict[str, Any]:
    """adapter.py:5-26 — Sequential(conv, relu, conv)."""
    pre = f"{prefix}." if prefix else ""
    return {
        "conv0": _conv(sd, f"{pre}net.0"),
        "conv1": _conv(sd, f"{pre}net.2"),
    }


def _seq_convs(sd, prefix, torch_idx, names):
    return {n: _conv(sd, f"{prefix}.{i}") for n, i in zip(names, torch_idx)}


def _memory_adapter(sd, variant: str, prefix="") -> Dict[str, Any]:
    """Key maps for the five memory adapters (finetune_memory.py:530-1192).
    Flax module names must match adapters/memory_adapters.py."""
    pre = f"{prefix}." if prefix else ""
    if variant == "memory_residual":
        return {"body": _seq_convs(sd, f"{pre}body", (0, 2, 4),
                                   ("conv0", "conv1", "conv2"))}
    if variant == "lowfreq_blend":
        return {
            "gate_conv0": _conv(sd, f"{pre}gate_net.0"),
            # gate_conv1 is a bare flax nn.Conv (no wrapper submodule)
            "gate_conv1": _conv(sd, f"{pre}gate_net.2")["conv"],
        }
    if variant == "tone_curve":
        return {
            "mlp0": _dense(sd, f"{pre}mlp.0"),
            "mlp1": _dense(sd, f"{pre}mlp.2"),
        }
    if variant in ("hyper_gated", "hyper_gated_fft"):
        return {
            "local": _seq_convs(sd, f"{pre}local_net", (0, 2, 4),
                                ("conv0", "conv1", "conv2")),
            "hyper": {
                "hyper0": _dense(sd, f"{pre}hyper_mlp.0"),
                "hyper1": _dense(sd, f"{pre}hyper_mlp.2"),
            },
        }
    raise ValueError(f"unknown memory adapter variant {variant!r}")


def import_pth(path_or_sd, arch: str, **kwargs) -> Dict[str, Any]:
    """Convert a reference checkpoint into a flax params dict.

    arch ∈ {UNet, RESNET, UNetImproved, output_adapter, memory_residual,
    lowfreq_blend, tone_curve, hyper_gated, hyper_gated_fft}.
    Pass ``prefix=`` to pull a submodule out of a wrapper checkpoint
    (e.g. prefix="base" / prefix="adapter" for DenoiserWithAdapter ckpts).
    """
    sd = path_or_sd if isinstance(path_or_sd, dict) else load_state_dict(path_or_sd)
    prefix = kwargs.pop("prefix", "")
    if prefix:
        sd = {k[len(prefix) + 1:]: v for k, v in sd.items() if k.startswith(prefix + ".")}
    if arch in ("UNet", "RESNET"):
        return _unet_like(sd)
    if arch == "UNetImproved":
        return _improved_unet(sd, **kwargs)
    if arch == "output_adapter":
        return _output_adapter(sd)
    return _memory_adapter(sd, arch)
