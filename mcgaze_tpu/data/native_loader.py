"""ctypes binding for the native C++ clip loader (native/clip_loader.cpp).

The native runtime replaces the reference's data-loading machinery (torch
DataLoader with 8 worker processes, mmdet/datasets/builder.py:87-160): a
persistent C++ thread pool decodes and augments frames straight into a
caller-owned float32 batch buffer. Falls back transparently to the pure
numpy/cv2 path (transforms.py) when the shared library isn't built.

Usage:
    loader = NativeClipLoader()          # raises if .so missing/unbuildable
    imgs, meta = loader.load(paths, crop_ratios, flips, scale, canvas)
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), 'native')
_SO_PATH = osp.join(_NATIVE_DIR, 'libmcgaze_loader.so')


def build_native(quiet: bool = True) -> bool:
    """Try to `make` the shared library; returns availability."""
    if osp.exists(_SO_PATH):
        return True
    try:
        subprocess.run(['make', '-C', _NATIVE_DIR],
                       check=True,
                       capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return osp.exists(_SO_PATH)


def native_available() -> bool:
    return osp.exists(_SO_PATH) or build_native()


class NativeClipLoader:
    """Thread-pooled decode+augment. One instance owns one C++ pool."""

    def __init__(self, n_threads: int = 0):
        if not native_available():
            raise RuntimeError(
                'native loader not built; run `make -C native`')
        lib = ctypes.CDLL(_SO_PATH)
        lib.mcg_pool_create.restype = ctypes.c_void_p
        lib.mcg_pool_create.argtypes = [ctypes.c_int]
        lib.mcg_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.mcg_load_frames.restype = ctypes.c_int
        lib.mcg_load_frames.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        try:
            lib.mcg_load_frames_u8.restype = ctypes.c_int
            lib.mcg_load_frames_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int32),
            ]
            self._has_u8 = True
        except AttributeError:      # stale pre-u8 build of the .so
            self._has_u8 = False
        # exact-warp (keep_ratio=False) capability probe — the
        # InstBlink/TeViT test pipeline's Resize
        self._has_warp = hasattr(lib, 'mcg_has_warp')
        self._lib = lib
        self._pool = lib.mcg_pool_create(n_threads)

    def __del__(self):
        pool = getattr(self, '_pool', None)
        if pool:
            self._lib.mcg_pool_destroy(pool)
            self._pool = None

    def _encode_scale(self, scale, keep_ratio):
        """keep_ratio=False rides the negative-scale exact-warp encoding
        (clip_loader.cpp::LoadOne); gated on the mcg_has_warp probe so a
        stale .so never misreads it."""
        if keep_ratio:
            return scale
        if not self._has_warp:
            raise RuntimeError(
                'libmcgaze_loader.so predates exact-warp (keep_ratio='
                'False); rebuild with `make -C native`')
        return (-abs(int(scale[0])), -abs(int(scale[1])))

    def load(self, paths: Sequence[str],
             crop_ratios: Optional[Sequence[float]],
             flips: Optional[Sequence[bool]],
             scale: Tuple[int, int],
             canvas: Tuple[int, int],
             out: Optional[np.ndarray] = None,
             keep_ratio: bool = True):
        """Decode+augment `paths` in parallel.

        crop_ratios: per-frame center-crop ratio (<=0 or None = no crop).
        scale: (w, h) resize target (keep-ratio fit, or the exact warp
        target when keep_ratio=False — the InstBlink/TeViT test
        pipeline's Resize). canvas: (H, W) pad size.
        Returns (imgs (N, H, W, 3) float32, meta (N, 6) int32
        [orig_h, orig_w, crop_h, crop_w, new_h, new_w]).
        """
        scale = self._encode_scale(scale, keep_ratio)
        n = len(paths)
        ch, cw = canvas
        if out is None:
            out = np.empty((n, ch, cw, 3), np.float32)
        assert out.shape == (n, ch, cw, 3) and out.dtype == np.float32
        meta = np.empty((n, 6), np.int32)
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        if crop_ratios is None:
            c_crops = None
        else:
            c_crops = (ctypes.c_float * n)(
                *[(-1.0 if r is None else float(r)) for r in crop_ratios])
        c_flips = None if flips is None else (
            ctypes.c_uint8 * n)(*[1 if f else 0 for f in flips])
        rc = self._lib.mcg_load_frames(
            self._pool, n, c_paths,
            ctypes.cast(c_crops, ctypes.POINTER(ctypes.c_float)),
            ctypes.cast(c_flips, ctypes.POINTER(ctypes.c_uint8)),
            scale[0], scale[1], ch, cw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc:
            raise FileNotFoundError(
                f'native loader failed to decode {paths[rc - 1]}')
        return out, meta

    def load_u8(self, paths: Sequence[str],
                crop_ratios: Optional[Sequence[float]],
                flips: Optional[Sequence[bool]],
                scale: Tuple[int, int],
                canvas: Tuple[int, int],
                out: Optional[np.ndarray] = None,
                keep_ratio: bool = True):
        """Like load() but emits RAW uint8 padded frames (no
        normalization) — 4x fewer bytes to ship when the consumer
        normalizes on-device inside its jit."""
        scale = self._encode_scale(scale, keep_ratio)
        if not self._has_u8:
            raise RuntimeError('libmcgaze_loader.so predates the uint8 '
                               'entry point; rebuild with `make -C native`')
        n = len(paths)
        ch, cw = canvas
        if out is None:
            out = np.empty((n, ch, cw, 3), np.uint8)
        assert out.shape == (n, ch, cw, 3) and out.dtype == np.uint8
        meta = np.empty((n, 6), np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        if crop_ratios is None:
            c_crops = None
        else:
            c_crops = (ctypes.c_float * n)(
                *[(-1.0 if r is None else float(r)) for r in crop_ratios])
        c_flips = None if flips is None else (
            ctypes.c_uint8 * n)(*[1 if f else 0 for f in flips])
        rc = self._lib.mcg_load_frames_u8(
            self._pool, n, c_paths,
            ctypes.cast(c_crops, ctypes.POINTER(ctypes.c_float)),
            ctypes.cast(c_flips, ctypes.POINTER(ctypes.c_uint8)),
            scale[0], scale[1], ch, cw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc:
            raise FileNotFoundError(
                f'native loader failed to decode {paths[rc - 1]}')
        return out, meta
