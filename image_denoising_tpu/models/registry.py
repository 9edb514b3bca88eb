"""Architecture registry.

``build_model(arch=...)`` is the explicit dispatch used by the finetune/eval
CLIs (reference ``finetune.py:189-204``). ``build_model_from_log_name``
reproduces the substring dispatch of ``train.py:298-314`` / ``evaluation.py:
32-48`` for CLI compatibility, but raises a clear error instead of leaving the
network undefined on no match (documented divergence: the reference NameErrors).
"""
from __future__ import annotations

from typing import Any, Optional

from .improved_unet import ImprovedUNet
from .resnet import RESNET
from .unet import UNet

ARCHS = ("UNet", "RESNET", "UNetImproved")


def build_model(
    arch: str,
    n_channel: int = 1,
    n_feature: int = 48,
    blindspot: bool = False,
    dtype: Optional[Any] = None,
    remat: bool = False,
    remat_depth: Optional[int] = None,
):
    if arch == "UNet":
        return UNet(in_nc=n_channel, out_nc=n_channel, n_feature=n_feature,
                    blindspot=blindspot, dtype=dtype)
    if arch == "RESNET":
        return RESNET(in_nc=n_channel, out_nc=n_channel, n_feature=n_feature,
                      blindspot=blindspot, dtype=dtype)
    if arch == "UNetImproved":
        return ImprovedUNet(in_nc=n_channel, out_nc=n_channel, n_feature=n_feature,
                            remat=remat, remat_depth=remat_depth, dtype=dtype)
    raise ValueError(f"Unknown arch: {arch!r} (choose from {ARCHS})")


def build_model_from_log_name(
    log_name: str,
    n_channel: int = 1,
    n_feature: int = 48,
    dtype: Optional[Any] = None,
    remat: bool = False,
    remat_depth: Optional[int] = None,
):
    """Reference substring dispatch (train.py:298-314), priority order kept."""
    if "UNET" in log_name and "blindspot" in log_name:
        return build_model("UNet", n_channel, n_feature, blindspot=True, dtype=dtype)
    if "UNET" in log_name:
        return build_model("UNet", n_channel, n_feature, dtype=dtype)
    if "RESNET" in log_name:
        return build_model("RESNET", n_channel, n_feature, dtype=dtype)
    if "UNetImproved" in log_name:
        return build_model("UNetImproved", n_channel, n_feature, dtype=dtype,
                           remat=remat, remat_depth=remat_depth)
    raise ValueError(
        f"log_name {log_name!r} matches no architecture "
        "(need one of UNET / RESNET / UNetImproved as a substring)"
    )
