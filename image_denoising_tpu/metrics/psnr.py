"""Peak signal-to-noise ratio in the 255 domain.

Reference semantics: ``utils_eval.py:49-53`` (plain) and ``finetune.py:165-173``
(the adapter trainers guard mse==0 with 99 dB). Both operate on float32 casts of
uint8-valued arrays; we keep float32 accumulation for bit parity.
"""
from __future__ import annotations

import numpy as np

__all__ = ["calculate_psnr"]


def calculate_psnr(target, ref, *, zero_mse_psnr: float | None = 99.0) -> float:
    """10·log10(255² / MSE) with float32 accumulation.

    ``zero_mse_psnr`` is returned when the images are identical (the adapter
    trainers' guard). Pass ``None`` to reproduce the un-guarded variant that
    returns ``inf`` (numpy warns) as in ``utils_eval.py:49-53``.
    """
    img1 = np.asarray(target, dtype=np.float32)
    img2 = np.asarray(ref, dtype=np.float32)
    diff = img1 - img2
    mse = np.mean(np.square(diff))
    if mse == 0:
        if zero_mse_psnr is not None:
            return float(zero_mse_psnr)
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))
