"""Native (C++) host-side components, loaded via ctypes.

The TPU framework's device compute path is JAX/XLA/Pallas; the host runtime
around it (batch sampling, image ingest — the part the reference delegates to
16 torch DataLoader workers, reference train.py:141-152) is native C++ here.
The library is compiled on first use with g++ (cached by source hash) and
every entry point has a pure-numpy fallback so the package works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "ray_sampler.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("NGP_PL_TPU_BUILD_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".native_build")
    os.makedirs(d, exist_ok=True)
    return d


def _compile() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_build_dir(), f"ray_sampler_{tag}.so")
    if not os.path.exists(so):
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            "-o", so + ".tmp", _SRC,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64, i32, u64 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.ngp_sample_batch_f32.argtypes = [
        pf, i64, i64, i64, i64, i32, u64, pi32, pi32, pf, ctypes.c_void_p]
    lib.ngp_sample_batch_u8.argtypes = [
        pu8, i64, i64, i64, i64, i32, u64, pi32, pi32, pf]
    lib.ngp_u8_to_rays.argtypes = [pu8, i64, i64, i32, pf]
    lib.ngp_downsample_box.argtypes = [pf, i64, i64, i64, i64, pf]
    lib.ngp_native_version.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled native library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("NGP_PL_TPU_NO_NATIVE"):
                _LIB = None
            else:
                _LIB = _compile()
            _TRIED = True
    return _LIB


def available() -> bool:
    return get_lib() is not None


_STRATEGIES = {"all_images": 0, "same_image": 1}


def sample_batch(rays: np.ndarray, batch_size: int, strategy: str,
                 seed: int) -> Optional[Dict[str, np.ndarray]]:
    """Native batch sampling over a preloaded (n_img, n_pix, C) ray store.

    Returns None when the native library is unavailable or the layout is
    unsupported (caller falls back to numpy).
    """
    lib = get_lib()
    if lib is None or rays.ndim != 3 or strategy not in _STRATEGIES:
        return None
    n_img, n_pix, ch = rays.shape
    if n_img == 0 or n_pix == 0 or ch < 3:
        return None
    img_idxs = np.empty(batch_size, np.int32)
    pix_idxs = np.empty(batch_size, np.int32)
    rgb = np.empty((batch_size, 3), np.float32)
    strat = _STRATEGIES[strategy]
    if rays.dtype == np.uint8:
        lib.ngp_sample_batch_u8(
            np.ascontiguousarray(rays), n_img, n_pix, ch, batch_size, strat,
            seed & 0xFFFFFFFFFFFFFFFF, img_idxs, pix_idxs, rgb)
        out = {"img_idxs": img_idxs, "pix_idxs": pix_idxs, "rgb": rgb}
    elif rays.dtype == np.float32:
        exposure = np.empty((batch_size, 1), np.float32) if ch >= 4 else None
        lib.ngp_sample_batch_f32(
            np.ascontiguousarray(rays), n_img, n_pix, ch, batch_size, strat,
            seed & 0xFFFFFFFFFFFFFFFF, img_idxs, pix_idxs, rgb,
            exposure.ctypes.data if exposure is not None else None)
        out = {"img_idxs": img_idxs, "pix_idxs": pix_idxs, "rgb": rgb}
        if exposure is not None:
            out["exposure"] = exposure
    else:
        return None
    return out


def u8_to_rays(img: np.ndarray, blend_a: bool = True,
               premultiply: bool = False) -> Optional[np.ndarray]:
    """uint8 (n_pix, C) -> float32 (n_pix, 3) with alpha handling
    (native path of reference datasets/color_utils.py:19-27)."""
    lib = get_lib()
    if lib is None or img.dtype != np.uint8 or img.ndim != 2:
        return None
    n_pix, ch = img.shape
    mode = 2
    if ch >= 4:
        mode = 1 if premultiply else (0 if blend_a else 2)
    out = np.empty((n_pix, 3), np.float32)
    lib.ngp_u8_to_rays(np.ascontiguousarray(img), n_pix, ch, mode, out)
    return out


def downsample_box(img: np.ndarray, factor: int) -> Optional[np.ndarray]:
    """(H, W, C) float32 integer-factor box downsample."""
    lib = get_lib()
    if lib is None or img.dtype != np.float32 or img.ndim != 3:
        return None
    h, w, c = img.shape
    out = np.empty((h // factor, w // factor, c), np.float32)
    lib.ngp_downsample_box(np.ascontiguousarray(img), h, w, c, factor, out)
    return out
