from .pixel import l1_loss, l2_loss, structure_loss, l1fft_loss, gradient_loss
from .iqsl import iqsl_loss, estimate_intensity_thresholds
from .n2n import n2n_regularized_loss

__all__ = [
    "l1_loss",
    "l2_loss",
    "structure_loss",
    "l1fft_loss",
    "gradient_loss",
    "iqsl_loss",
    "estimate_intensity_thresholds",
    "n2n_regularized_loss",
]
