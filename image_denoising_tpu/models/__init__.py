from .unet import UNet
from .resnet import RESNET
from .improved_unet import ImprovedUNet
from .registry import build_model, build_model_from_log_name

__all__ = ["UNet", "RESNET", "ImprovedUNet", "build_model", "build_model_from_log_name"]
