from .psnr import calculate_psnr
from .ssim import ssim, calculate_ssim
from .iq_iou import compute_iq_iou, quantize_3class, to_gray_float01
from .device import frame_iq_iou, frame_psnr_ssim, make_device_metrics

__all__ = [
    "frame_iq_iou",
    "make_device_metrics",
    "frame_psnr_ssim",
    "calculate_psnr",
    "ssim",
    "calculate_ssim",
    "compute_iq_iou",
    "quantize_3class",
    "to_gray_float01",
]
