"""Native (C++) host runtime components, ctypes-bound.

The TPU compute path is JAX/Pallas; the host data path around it is native
where the work is memory-bound C territory: the scene-tile server fuses the
reference's crop-then-resize patch loop
(`/root/reference/scripts/aerial_image_segmentation_api.py:349-373`) into a
single pass over the raster (see ``tileserver.cpp``).

The shared library is built on first import with the system ``g++`` and
cached next to the source keyed by a source hash; any failure (no
compiler, build error, exotic platform) degrades silently to the Python
path — callers must treat :func:`get_tileserver` returning ``None`` as
"use the fallback".  ``SSUNET_GAN_TPU_NATIVE=0`` disables the native path
outright.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "tileserver.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_ABI_VERSION = 1

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    path = os.path.join(_BUILD_DIR, f"libtileserver-{tag}.so")
    if os.path.exists(path):
        return path
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, path)  # atomic under concurrent builders
        return path
    except (OSError, subprocess.SubprocessError) as e:
        print(f"[ssunet_gan_tpu.native] tileserver build failed: {e}",
              file=sys.stderr)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def get_tileserver() -> Optional[ctypes.CDLL]:
    """The bound native library, or ``None`` when unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("SSUNET_GAN_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            if lib.tile_server_abi_version() != _ABI_VERSION:
                return None
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i64 = ctypes.c_int64
            lib.tile_extract_resize_u8.argtypes = [
                u8p, i64, i64, i64, i64p, i64, i64, i64, i64, u8p,
                ctypes.c_int,
            ]
            lib.tile_extract_u8.argtypes = [
                u8p, i64, i64, i64, i64p, i64, i64, u8p, ctypes.c_int,
            ]
            _lib = lib
        except OSError as e:
            print(f"[ssunet_gan_tpu.native] tileserver load failed: {e}",
                  file=sys.stderr)
        return _lib


def native_available() -> bool:
    return get_tileserver() is not None


def _as_c(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def _nthreads() -> int:
    env = os.environ.get("SSUNET_GAN_TPU_NATIVE_THREADS")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 1)


def extract_resize_u8(scene: np.ndarray, coords: np.ndarray, p_size: int,
                      out_h: int, out_w: int,
                      out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Fused crop+bilinear-resize of sliding-window tiles.

    ``scene``: (H, W, C) uint8, C-contiguous.  ``coords``: (N, 2) (y, x)
    origins of ``p_size``² patches fully inside the scene.  Returns the
    (N, out_h, out_w, C) uint8 tile set, or ``None`` when the native path
    is unavailable (caller falls back to cv2).
    """
    lib = get_tileserver()
    if lib is None or scene.dtype != np.uint8 or not scene.flags.c_contiguous:
        return None
    if p_size < 2:  # the 1px-patch edge case keeps the cv2 path
        return None
    h, w, c = scene.shape
    cds = np.ascontiguousarray(coords, dtype=np.int64)
    if len(cds) and (
        cds.min() < 0
        or (cds[:, 0] + p_size).max() > h
        or (cds[:, 1] + p_size).max() > w
    ):
        raise ValueError("patch coords fall outside the scene")
    if out is None:
        out = np.empty((len(cds), out_h, out_w, c), np.uint8)
    lib.tile_extract_resize_u8(
        _as_c(scene, ctypes.c_uint8), h, w, c,
        _as_c(cds, ctypes.c_int64), len(cds), p_size, out_h, out_w,
        _as_c(out, ctypes.c_uint8), _nthreads(),
    )
    return out


def extract_u8(scene: np.ndarray, coords: np.ndarray,
               p_size: int) -> Optional[np.ndarray]:
    """Native crop of (N, p, p, C) uint8 patches (mask path)."""
    lib = get_tileserver()
    if lib is None or scene.dtype != np.uint8 or not scene.flags.c_contiguous:
        return None
    h, w, c = scene.shape
    cds = np.ascontiguousarray(coords, dtype=np.int64)
    if len(cds) and (
        cds.min() < 0
        or (cds[:, 0] + p_size).max() > h
        or (cds[:, 1] + p_size).max() > w
    ):
        raise ValueError("patch coords fall outside the scene")
    out = np.empty((len(cds), p_size, p_size, c), np.uint8)
    lib.tile_extract_u8(
        _as_c(scene, ctypes.c_uint8), h, w, c,
        _as_c(cds, ctypes.c_int64), len(cds), p_size,
        _as_c(out, ctypes.c_uint8), _nthreads(),
    )
    return out
