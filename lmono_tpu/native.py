"""ctypes bindings for the native C++ runtime (with pure-Python fallback).

The shared library (`native/libmono_native.so`, built by `make -C native`)
provides the host-side hot paths: threaded KITTI scan loading + range-image
regridding and binary PLY export.  Every entry point has a numpy fallback so
the engine runs (slower) without the native build.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from lmono_tpu.config import LidarConfig

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libmono_native.so")

_lib: Optional[ctypes.CDLL] = None


def load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lmono_regrid.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
    lib.lmono_loader_create.restype = ctypes.c_void_p
    lib.lmono_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int]
    lib.lmono_loader_next.restype = ctypes.c_int
    lib.lmono_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8)]
    lib.lmono_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.lmono_ply_write.restype = ctypes.c_int64
    lib.lmono_ply_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_RING_MODES = {"uniform": 0, "hdl64": 1, "auto": 2}


def _ring_mode_int(cfg: LidarConfig) -> int:
    return _RING_MODES[getattr(cfg, "ring_mode", "auto")]


def regrid(xyz4: np.ndarray, cfg: LidarConfig) -> dict:
    """(N,4) velodyne buffer → {ranges, points, valid} fixed grids.

    Uses the native threaded regridder when available, else the numpy
    implementation in `lmono_tpu.io.kitti`.
    """
    lib = load_native()
    if lib is None:
        from lmono_tpu.io.kitti import scan_to_range_image
        return scan_to_range_image(np.ascontiguousarray(xyz4), cfg,
                                   ring_mode=getattr(cfg, "ring_mode", "auto"))
    xyz4 = np.ascontiguousarray(xyz4, np.float32)
    R, W = cfg.num_rings, cfg.horiz_res
    ranges = np.empty((R, W), np.float32)
    points = np.empty((R, W, 3), np.float32)
    valid = np.empty((R, W), np.uint8)
    lib.lmono_regrid(_fp(xyz4), len(xyz4), R, W,
                     cfg.vertical_fov_deg[0], cfg.vertical_fov_deg[1],
                     cfg.min_range, cfg.max_range, _ring_mode_int(cfg),
                     _fp(ranges), _fp(points), _u8p(valid))
    return {"ranges": ranges, "points": points, "valid": valid.astype(bool)}


class NativeScanLoader:
    """Prefetching velodyne loader (threaded in C++; sequential fallback)."""

    def __init__(self, velo_dir: str, n_frames: int, cfg: LidarConfig,
                 prefetch: int = 4):
        self.cfg = cfg
        self.n_frames = n_frames
        self._lib = load_native()
        self._dir = velo_dir
        self._i = 0
        if self._lib is not None:
            self._h = self._lib.lmono_loader_create(
                velo_dir.encode(), n_frames, cfg.num_rings, cfg.horiz_res,
                cfg.vertical_fov_deg[0], cfg.vertical_fov_deg[1],
                cfg.min_range, cfg.max_range, _ring_mode_int(cfg), prefetch)
        else:
            self._h = None

    def next(self) -> Optional[dict]:
        if self._i >= self.n_frames:
            return None
        if self._h is not None:
            R, W = self.cfg.num_rings, self.cfg.horiz_res
            ranges = np.empty((R, W), np.float32)
            points = np.empty((R, W, 3), np.float32)
            valid = np.empty((R, W), np.uint8)
            idx = self._lib.lmono_loader_next(
                self._h, _fp(ranges), _fp(points), _u8p(valid))
            if idx < 0:
                return None
            self._i += 1
            return {"index": idx, "ranges": ranges, "points": points,
                    "valid": valid.astype(bool)}
        # fallback: read + regrid on the calling thread
        path = os.path.join(self._dir, f"{self._i:06d}.bin")
        xyz4 = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
        out = regrid(xyz4, self.cfg)
        out["index"] = self._i
        self._i += 1
        return out

    def close(self):
        if self._h is not None and self._lib is not None:
            self._lib.lmono_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def ply_write(path: str, xyz: np.ndarray, rgb01: np.ndarray) -> int:
    """Binary PLY export; native fast path or numpy fallback."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    rgb = np.ascontiguousarray(
        (np.clip(rgb01, 0, 1) * 255).astype(np.uint8))
    lib = load_native()
    if lib is None:
        from lmono_tpu.mapping.builder import ColorMap, save_ply
        import jax.numpy as jnp
        cm = ColorMap(jnp.asarray(xyz), jnp.asarray(rgb01),
                      jnp.ones(len(xyz), bool))
        return save_ply(path, cm)
    return int(lib.lmono_ply_write(path.encode(), _fp(xyz), _u8p(rgb),
                                   len(xyz)))
