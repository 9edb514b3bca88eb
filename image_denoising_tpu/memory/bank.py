"""Retrieval memory bank: dense strided patch extraction + device residency.

Reference semantics (``finetune_memory.py:447-499``): F.unfold-based dense
patch extraction (patch 128, stride 4–64) from the first N image pairs; banks
[N_mem, C, P, P] resident on device. At the production stride of 4 a 704²
frame yields ~2.1e4 patches/image — a multi-GB bank, the "memory-bounded"
constraint the reference works around with patchwise streaming.

TPU-native design:
* extraction is a zero-copy host ``sliding_window_view`` (no im2col buffer),
* the noise bank is stored FLATTENED [N, P·P·C] and optionally bfloat16 —
  halving HBM and letting the retrieval matmul hit the MXU natively with f32
  accumulation (`preferred_element_type`) — or **int8**: source images are
  uint8, so patches are stored centered (k−128 ∈ [−128,127]) and distances
  compute EXACTLY in integer arithmetic on the MXU's double-rate int8 path
  (int32 accumulation; ‖a−b‖² is shift-invariant, so centering changes
  nothing). 4× less bank HBM than f32 and *more* exact than the f32 path
  (f32 distance rounding can misrank near-ties; integers cannot),
* squared norms are precomputed once (the ``b²`` term of a²+b²−2ab) — f32 in
  the [0,1] domain, int32 in the centered-int domain for int8 banks (the
  norms exceed 2²⁴, so f32 storage would break integer exactness),
* the clean bank defaults to float32; ``clean_dtype="uint8"`` stores the
  source bytes instead — LOSSLESS for uint8-sourced frames (values are
  exactly k/255; the consumer divides by 255 after the top-1 gather, see
  adapters.wrappers) and 4× less HBM: the production stride-4 clean bank
  drops 6.9 GB → 1.7 GB, so int8-noise + uint8-clean fits the whole regime
  in ~3.4 GB.

Patch ordering matches torch unfold (row-major over valid positions), so
retrieved indices are comparable with the reference.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List

import numpy as np

__all__ = ["extract_patches", "build_memory_bank", "MemoryBank"]


def extract_patches(img: np.ndarray, patch_size: int, stride: int) -> np.ndarray:
    """[H,W] or [H,W,C] float image → [N, P, P, C] patches (row-major grid)."""
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    p = patch_size
    windows = np.lib.stride_tricks.sliding_window_view(img, (p, p), axis=(0, 1))
    # windows: [H-p+1, W-p+1, C, p, p]
    windows = windows[::stride, ::stride]
    n = windows.shape[0] * windows.shape[1]
    patches = windows.transpose(0, 1, 3, 4, 2).reshape(n, p, p, c)
    return np.ascontiguousarray(patches)


@dataclass
class MemoryBank:
    """Device-resident (noise, clean) patch bank with precomputed norms."""

    noise_flat: Any  # [N, D] device array (f32 / bf16 / centered int8)
    clean: Any  # [N, P, P, C] device array f32 (or uint8, /255 after gather)
    sq_norms: Any  # [N] ‖noise_i‖² — f32 ([0,1] domain) or int32 (int8 banks)
    patch_size: int
    stride: int

    @property
    def size(self) -> int:
        return int(self.noise_flat.shape[0])


def _uint8_exact(arr: np.ndarray) -> bool:
    return (
        float(arr.min()) >= 0.0
        and float(arr.max()) <= 255.0
        and np.array_equal(arr, np.round(arr))
    )


def build_memory_bank(
    clean_paths: List[str],
    noise_paths: List[str],
    patch_size: int,
    stride: int,
    bank_dtype: str = "float32",
    pad_to: int = 0,
    clean_dtype: str = "float32",
) -> MemoryBank:
    """Build the bank from image paths (values scaled to [0,1]).

    ``pad_to`` > 0 pads the noise bank's N up to a multiple (padding rows get
    +inf squared norms so retrieval never selects them) — required by the
    streaming Pallas retrieval kernel's tile grid. The clean bank stays
    unpadded: padded indices are unreachable.

    ``clean_dtype="uint8"`` stores the clean bank as source bytes (4× less
    HBM, bit-exact for uint8 frames — the gather consumer divides by 255);
    refuses non-byte-exact clean frames like the int8 noise path does.
    """
    import jax.numpy as jnp

    from ..data.pairs import load_image_f32

    assert len(clean_paths) == len(noise_paths) and clean_paths
    assert clean_dtype in ("float32", "uint8"), clean_dtype
    all_clean, all_noise = [], []
    for cp, npth in zip(clean_paths, noise_paths):
        clean_raw = load_image_f32(cp)
        noise_raw = load_image_f32(npth)
        if clean_dtype == "uint8" and not _uint8_exact(clean_raw):
            raise ValueError(
                f"--clean_bank_dtype uint8 requires uint8-exact clean frames, "
                f"but {cp} is not byte-exact (high-bit-depth input?). Use "
                f"--clean_bank_dtype float32 for this data."
            )
        if bank_dtype == "int8" and not _uint8_exact(noise_raw):
            # int8 banks promise EXACT integer distances, which holds only
            # when round(x·255) recovers the source byte exactly. High-bit-
            # depth input (e.g. 16-bit TIFF, data/pairs.py:168-172 applies
            # the same uint8-exactness rule) would be silently quantized to
            # 256 levels — refuse instead of degrading retrieval silently.
            raise ValueError(
                f"--bank_dtype int8 requires uint8-exact noise frames, but "
                f"{npth} is not byte-exact (high-bit-depth input?). Use "
                f"--bank_dtype float32 or bfloat16 for this data."
            )
        clean_arr = clean_raw / 255.0
        noise_arr = noise_raw / 255.0
        cpatches = extract_patches(clean_arr.astype(np.float32), patch_size, stride)
        npatches = extract_patches(noise_arr.astype(np.float32), patch_size, stride)
        assert cpatches.shape == npatches.shape
        all_clean.append(cpatches)
        all_noise.append(npatches)

    clean = np.concatenate(all_clean, axis=0)
    noise = np.concatenate(all_noise, axis=0)
    n = noise.shape[0]
    noise_flat = noise.reshape(n, -1)

    if clean_dtype == "uint8":
        # exact: clean values are k/255 (byte-exactness checked above), so
        # round(x·255) recovers k and the post-gather /255 is bit-identical
        clean_dev = jnp.asarray(np.round(clean * 255.0).astype(np.uint8))
    else:
        clean_dev = jnp.asarray(clean, jnp.float32)

    if bank_dtype == "int8":
        # centered exact-integer bank: inputs are uint8-sourced, so
        # round(x·255) recovers the original byte exactly; −128 recenters
        # into int8 range (distances are shift-invariant)
        noise_int = np.round(noise_flat * 255.0).astype(np.int32) - 128
        sq_norms = np.sum(noise_int * noise_int, axis=1, dtype=np.int64)
        assert sq_norms.max(initial=0) < np.iinfo(np.int32).max
        sq_norms = sq_norms.astype(np.int32)
        noise_int8 = noise_int.astype(np.int8)
        if pad_to:
            # Pallas tile padding: zero rows with INT32_MAX norms (the
            # int analog of the float path's +inf — never selected)
            n_pad = (-n) % pad_to
            if n_pad:
                noise_int8 = np.concatenate(
                    [noise_int8,
                     np.zeros((n_pad, noise_int8.shape[1]), np.int8)]
                )
                sq_norms = np.concatenate(
                    [sq_norms,
                     np.full((n_pad,), np.iinfo(np.int32).max, np.int32)]
                )
        print(
            f"[MemoryBank] #clean patches={n}, patch_size={patch_size}, "
            f"stride={stride}, dtype=int8 (exact integer distances)"
            + (f", padded to {noise_int8.shape[0]}" if pad_to else "")
        )
        return MemoryBank(
            noise_flat=jnp.asarray(noise_int8),
            clean=clean_dev,
            sq_norms=jnp.asarray(sq_norms),
            patch_size=patch_size,
            stride=stride,
        )

    sq_norms = np.sum(noise_flat.astype(np.float32) ** 2, axis=1)

    if pad_to:
        n_pad = (-n) % pad_to
        if n_pad:
            noise_flat = np.concatenate(
                [noise_flat, np.zeros((n_pad, noise_flat.shape[1]), np.float32)]
            )
            sq_norms = np.concatenate(
                [sq_norms, np.full((n_pad,), np.inf, np.float32)]
            )

    dt = jnp.bfloat16 if bank_dtype == "bfloat16" else jnp.float32
    print(
        f"[MemoryBank] #clean patches={n}, patch_size={patch_size}, "
        f"stride={stride}, dtype={bank_dtype}"
        + (f", padded to {noise_flat.shape[0]}" if pad_to else "")
    )
    return MemoryBank(
        noise_flat=jnp.asarray(noise_flat, dt),
        clean=clean_dev,
        sq_norms=jnp.asarray(sq_norms, jnp.float32),
        patch_size=patch_size,
        stride=stride,
    )
