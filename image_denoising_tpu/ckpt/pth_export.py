"""Export flax params to reference-format PyTorch ``.pth`` state dicts.

The inverse of ``pth_import``: lets a reference user take checkpoints trained
here back into the PyTorch codebase (same key names and tensor layouts as
``arch_unet.py`` / ``adapter.py`` / ``finetune_memory.py`` state dicts).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["export_pth", "params_to_state_dict"]


def _np(x):
    return np.asarray(x)


def _conv_out(out, prefix, p):
    out[f"{prefix}.weight"] = np.transpose(_np(p["conv"]["kernel"]), (3, 2, 0, 1))
    if "bias" in p["conv"]:
        out[f"{prefix}.bias"] = _np(p["conv"]["bias"])


def _deconv_out(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["deconv"]["kernel"])
    out[f"{prefix}.bias"] = _np(p["deconv"]["bias"])


def _gn_out(out, prefix, p):
    out[f"{prefix}.weight"] = _np(p["gn"]["scale"])
    out[f"{prefix}.bias"] = _np(p["gn"]["bias"])


def _dense_out(out, prefix, p):
    out[f"{prefix}.weight"] = np.transpose(_np(p["kernel"]))
    out[f"{prefix}.bias"] = _np(p["bias"])


def _rdb_out(out, prefix, p, layers=4):
    for i in range(layers):
        _conv_out(out, f"{prefix}.convs.{i}", p[f"conv{i}"])
    _conv_out(out, f"{prefix}.lff", p["lff"])


def _res_out(out, prefix, p):
    _conv_out(out, f"{prefix}.block.0", p["conv0"])
    _gn_out(out, f"{prefix}.block.1", p["norm0"])
    _conv_out(out, f"{prefix}.block.3", p["conv1"])
    _gn_out(out, f"{prefix}.block.4", p["norm1"])


def _up_out(out, prefix, p):
    _conv_out(out, f"{prefix}.conv_ps", p["conv_ps"])
    _conv_out(out, f"{prefix}.fuse", p["fuse"])
    _rdb_out(out, f"{prefix}.rdb", p["rdb"])
    _res_out(out, f"{prefix}.res", p["res"])


def _unet_like_out(params, arch: str = "UNet") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for name, p in params.items():
        if name.startswith("up") and "deconv" in p:
            _deconv_out(out, f"{name}.deconv", p)
        else:
            _conv_out(out, name, p)
    if arch == "RESNET" and "up5.deconv.weight" not in out:
        # the reference RESNET constructs an UpsampleCat it never calls
        # (arch_unet.py:301 vs forward :373) — synthesize its keys so strict
        # state-dict loads succeed; values are irrelevant to the forward
        nf = out["enc_conv0.weight"].shape[0]
        out["up5.deconv.weight"] = np.zeros((nf, nf, 2, 2), np.float32)
        out["up5.deconv.bias"] = np.zeros((nf,), np.float32)
    return out


def _improved_out(params, depth=4) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if "noise_est_conv0" in params:
        _conv_out(out, "noise_estimator.0", params["noise_est_conv0"])
        _conv_out(out, "noise_estimator.2", params["noise_est_conv1"])
    for i in range(depth):
        _conv_out(out, f"downs.{i}.0", params[f"down{i}_conv"])
        _rdb_out(out, f"downs.{i}.2", params[f"down{i}_rdb"])
        _res_out(out, f"downs.{i}.3", params[f"down{i}_res"])
    _rdb_out(out, "bottle.0", params["bottle_rdb"])
    _res_out(out, "bottle.1", params["bottle_res"])
    for i in range(depth):
        _up_out(out, f"ups.{i}", params[f"up{i}"])
    _conv_out(out, "final", params["final"])
    return out


def _output_adapter_out(params) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _conv_out(out, "net.0", params["conv0"])
    _conv_out(out, "net.2", params["conv1"])
    return out


def _memory_adapter_out(params, variant) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if variant == "memory_residual":
        for name, idx in (("conv0", 0), ("conv1", 2), ("conv2", 4)):
            _conv_out(out, f"body.{idx}", params["body"][name])
        return out
    if variant == "lowfreq_blend":
        _conv_out(out, "gate_net.0", params["gate_conv0"])
        _conv_out(out, "gate_net.2", {"conv": params["gate_conv1"]})
        return out
    if variant == "tone_curve":
        _dense_out(out, "mlp.0", params["mlp0"])
        _dense_out(out, "mlp.2", params["mlp1"])
        return out
    if variant in ("hyper_gated", "hyper_gated_fft"):
        for name, idx in (("conv0", 0), ("conv1", 2), ("conv2", 4)):
            _conv_out(out, f"local_net.{idx}", params["local"][name])
        _dense_out(out, "hyper_mlp.0", params["hyper"]["hyper0"])
        _dense_out(out, "hyper_mlp.2", params["hyper"]["hyper1"])
        return out
    raise ValueError(variant)


def params_to_state_dict(params: Any, arch: str) -> Dict[str, np.ndarray]:
    if arch in ("UNet", "RESNET"):
        return _unet_like_out(params, arch)
    if arch == "UNetImproved":
        return _improved_out(params)
    if arch == "output_adapter":
        return _output_adapter_out(params)
    return _memory_adapter_out(params, arch)


def export_pth(params: Any, arch: str, path: str) -> str:
    """Write a torch-loadable .pth state dict (requires torch at call time)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(params, arch).items()}
    torch.save(sd, path)
    return path
