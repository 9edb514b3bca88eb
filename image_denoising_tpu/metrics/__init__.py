from .psnr import calculate_psnr
from .ssim import ssim, calculate_ssim
from .iq_iou import compute_iq_iou, quantize_3class, to_gray_float01

__all__ = [
    "calculate_psnr",
    "ssim",
    "calculate_ssim",
    "compute_iq_iou",
    "quantize_3class",
    "to_gray_float01",
]
