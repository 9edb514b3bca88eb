"""ctypes binding for the native threaded patch sampler (native/patch_sampler.cpp).

Auto-builds the shared library on first use when a compiler is available;
callers fall back to the numpy sampler when the native path is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Tuple

import numpy as np

__all__ = ["NativePatchSampler", "load_library"]

_REPO_NATIVE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB = None
_LIB_FAILED = False


def load_library(build_if_missing: bool = True):
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so_path = os.path.join(_REPO_NATIVE, "libpatch_sampler.so")
    if not os.path.exists(so_path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _REPO_NATIVE], check=True,
                           capture_output=True)
        except Exception as e:  # no compiler / read-only install
            print(f"[native_sampler] build failed ({e}); using numpy fallback")
            _LIB_FAILED = True
            return None
    if not os.path.exists(so_path):
        _LIB_FAILED = True
        return None
    lib = ctypes.CDLL(so_path)
    lib.ps_create.restype = ctypes.c_void_p
    lib.ps_create.argtypes = [ctypes.c_int]
    lib.ps_destroy.argtypes = [ctypes.c_void_p]
    lib.ps_add_image.restype = ctypes.c_int
    lib.ps_add_image.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.ps_sample_batch.restype = ctypes.c_int
    lib.ps_sample_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    _LIB = lib
    return lib


class NativePatchSampler:
    """Deterministic threaded random-crop batches over resident uint8 pairs."""

    def __init__(self, images: List[Tuple[np.ndarray, np.ndarray]],
                 n_threads: int = 4):
        """images: list of (clean_u8 [H,W,C], noise_u8 [H,W,C])."""
        lib = load_library()
        if lib is None:
            raise RuntimeError("native patch sampler library unavailable")
        self._lib = lib
        self._handle = lib.ps_create(len(images))
        self.n_threads = n_threads
        self.channels = images[0][0].shape[-1]
        self.n_images = len(images)
        for i, (clean, noise) in enumerate(images):
            clean = np.ascontiguousarray(clean, dtype=np.uint8)
            noise = np.ascontiguousarray(noise, dtype=np.uint8)
            h, w, c = clean.shape
            rc = lib.ps_add_image(
                self._handle, i,
                clean.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                noise.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                h, w, c,
            )
            if rc != 0:
                raise RuntimeError(f"ps_add_image failed: {rc}")

    def sample(self, seed: int, batch_index: int, img_of_item: np.ndarray,
               patch: int) -> Tuple[np.ndarray, np.ndarray]:
        """→ (clean, noise) float32 [B, patch, patch, C] in [0,1]."""
        batch = len(img_of_item)
        img_of_item = np.ascontiguousarray(img_of_item, dtype=np.int32)
        out_c = np.empty((batch, patch, patch, self.channels), np.float32)
        out_n = np.empty((batch, patch, patch, self.channels), np.float32)
        rc = self._lib.ps_sample_batch(
            self._handle, ctypes.c_uint64(seed), ctypes.c_uint64(batch_index),
            batch, patch,
            img_of_item.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_n.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        if rc != 0:
            raise RuntimeError(f"ps_sample_batch failed: {rc}")
        return out_c, out_n

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ps_destroy(self._handle)
        except Exception:
            pass
