"""ctypes bindings for the native (C++/libjpeg) frame-loading pipeline.

Builds native/librubiks_loader.so on first use (make) and exposes
batch-parallel decode + shorter-side resize + crop + normalize directly into
channel-last float32 — the replacement for the reference's PIL DataLoader
hot path (see native/rubiks_loader.cpp). Falls back cleanly when the
toolchain or libjpeg is unavailable: ``available()`` returns False and
callers keep using the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "librubiks_loader.so"))

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Always run make: a no-op when the .so is fresh, a rebuild when
    # rubiks_loader.cpp is newer than a stale committed binary.
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=os.path.abspath(_NATIVE_DIR),
            check=True,
            capture_output=True,
        )
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rl_load_frames.restype = ctypes.c_int
    lib.rl_load_frames.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
    ]
    if hasattr(lib, "rl_load_frames_mc"):
        lib.rl_load_frames_mc.restype = ctypes.c_int
        lib.rl_load_frames_mc.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
        ]
    lib.rl_decode_frame_u8.restype = ctypes.c_int
    lib.rl_decode_frame_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    if hasattr(lib, "rl_load_frames_u8"):
        lib.rl_load_frames_u8.restype = ctypes.c_int
        lib.rl_load_frames_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_int,
        ]
        lib.rl_load_frames_mc_u8.restype = ctypes.c_int
        lib.rl_load_frames_mc_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
            ctypes.c_long,
            ctypes.c_int,
        ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_frames(
    paths: Sequence[str],
    scale_size: int,
    crop_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    crop_offsets: Optional[Sequence[tuple]] = None,
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode + resize + crop + normalize a list of frames in parallel.

    Args:
      paths: JPEG file paths (one per output frame).
      scale_size: shorter-side resize target (0 = no resize).
      crop_size: square crop size.
      crop_offsets: per-frame (x, y) crop origins; None = center crop.
    Returns:
      (len(paths), crop_size, crop_size, 3) float32, normalized.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, crop_size, crop_size, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if crop_offsets is None:
        xs = np.full(n, -1, np.int32)
        ys = np.full(n, -1, np.int32)
    else:
        xs = np.asarray([o[0] for o in crop_offsets], np.int32)
        ys = np.asarray([o[1] for o in crop_offsets], np.int32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    threads = num_threads if num_threads is not None else (os.cpu_count() or 1)
    failures = lib.rl_load_frames(
        c_paths,
        n,
        scale_size,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        crop_size,
        crop_size,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        crop_size * crop_size * 3,
        threads,
    )
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} frames")
    return out


def load_frames_multicrop(
    paths: Sequence[str],
    scale_size: int,
    crop_size: int,
    mean: Sequence[float],
    std: Sequence[float],
    crop_offsets: Sequence[tuple],
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode each frame once and emit several crops of it.

    The multi-view eval protocols (GroupFullResSample's 3 crops) take
    multiple windows of the SAME resized frame; this entry point decodes +
    resizes once per frame instead of once per (frame, crop).

    Args:
      paths: JPEG file paths (n frames).
      crop_offsets: (x, y) crop origins shared by all frames (one per crop).
    Returns:
      (len(crop_offsets) * len(paths), crop_size, crop_size, 3) float32,
      ordered crop-major (crop 0's frames, then crop 1's, ...) to match the
      GroupFullResSample view ordering.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    if not hasattr(lib, "rl_load_frames_mc"):
        # stale .so without the multicrop entry point: fall back
        rep_paths = [p for _ in crop_offsets for p in paths]
        rep_offsets = [o for o in crop_offsets for _ in paths]
        return load_frames(rep_paths, scale_size, crop_size, mean, std,
                           crop_offsets=rep_offsets, num_threads=num_threads)
    n = len(paths)
    n_crops = len(crop_offsets)
    out = np.empty((n_crops * n, crop_size, crop_size, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    xs = np.asarray([o[0] for o in crop_offsets], np.int32)
    ys = np.asarray([o[1] for o in crop_offsets], np.int32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    threads = num_threads if num_threads is not None else (os.cpu_count() or 1)
    frame_stride = crop_size * crop_size * 3
    failures = lib.rl_load_frames_mc(
        c_paths,
        n,
        scale_size,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_crops,
        crop_size,
        crop_size,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frame_stride,
        n * frame_stride,
        threads,
    )
    if failures:
        raise IOError(
            f"native loader failed on {failures}/{n * n_crops} frame-crops"
        )
    return out


def load_frames_u8(
    paths: Sequence[str],
    scale_size: int,
    crop_size: int,
    crop_offsets: Optional[Sequence[tuple]] = None,
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode + resize + crop a list of frames in parallel to raw uint8.

    The device-normalize input path: ((v/255) - mean) / std runs inside the
    jitted eval step, so the host ships 4x fewer bytes than normalized f32.
    Returns (len(paths), crop_size, crop_size, 3) uint8.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    if not hasattr(lib, "rl_load_frames_u8"):
        raise RuntimeError("stale librubiks_loader.so without the u8 entry "
                           "points; rebuild with make")
    n = len(paths)
    out = np.empty((n, crop_size, crop_size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if crop_offsets is None:
        xs = np.full(n, -1, np.int32)
        ys = np.full(n, -1, np.int32)
    else:
        xs = np.asarray([o[0] for o in crop_offsets], np.int32)
        ys = np.asarray([o[1] for o in crop_offsets], np.int32)
    threads = num_threads if num_threads is not None else (os.cpu_count() or 1)
    failures = lib.rl_load_frames_u8(
        c_paths,
        n,
        scale_size,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        crop_size,
        crop_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        crop_size * crop_size * 3,
        threads,
    )
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} frames")
    return out


def load_frames_multicrop_u8(
    paths: Sequence[str],
    scale_size: int,
    crop_size: int,
    crop_offsets: Sequence[tuple],
    num_threads: Optional[int] = None,
) -> np.ndarray:
    """Decode-once multicrop to raw uint8 (see load_frames_multicrop /
    load_frames_u8). Returns (len(crop_offsets) * len(paths), crop, crop, 3)
    uint8, crop-major."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    if not hasattr(lib, "rl_load_frames_mc_u8"):
        raise RuntimeError("stale librubiks_loader.so without the u8 entry "
                           "points; rebuild with make")
    n = len(paths)
    n_crops = len(crop_offsets)
    out = np.empty((n_crops * n, crop_size, crop_size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    xs = np.asarray([o[0] for o in crop_offsets], np.int32)
    ys = np.asarray([o[1] for o in crop_offsets], np.int32)
    threads = num_threads if num_threads is not None else (os.cpu_count() or 1)
    frame_stride = crop_size * crop_size * 3
    failures = lib.rl_load_frames_mc_u8(
        c_paths,
        n,
        scale_size,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_crops,
        crop_size,
        crop_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frame_stride,
        n * frame_stride,
        threads,
    )
    if failures:
        raise IOError(
            f"native loader failed on {failures}/{n * n_crops} frame-crops"
        )
    return out


def decode_frame_u8(
    path: str, scale_size: int, crop_size: int, crop_x: int = -1, crop_y: int = -1
) -> np.ndarray:
    """Single-frame decode+resize+crop to uint8 (for parity tests)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((crop_size, crop_size, 3), np.uint8)
    rc = lib.rl_decode_frame_u8(
        path.encode(), scale_size, crop_x, crop_y, crop_size, crop_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc:
        raise IOError(f"failed to decode {path}")
    return out
