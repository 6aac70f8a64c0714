"""ctypes bindings for the native host preprocessing library
(native/dsf_host.cpp).  Falls back to the NumPy path in data/crop.py if
the shared object hasn't been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libdsf_host.so"),
                 os.path.join(os.path.dirname(__file__), "libdsf_host.so")):
        if os.path.exists(cand):
            return cand
    return None


def load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.crop_deep_pp.argtypes = [f32p, ctypes.c_int, ctypes.c_int, f32p,
                                 f32p, f32p, ctypes.c_int, f32p, f32p]
    lib.warp_perspective_nearest.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, f32p]
    lib.normalize_depth.argtypes = [f32p, ctypes.c_int, ctypes.c_float,
                                    ctypes.c_float, ctypes.c_float]
    lib.batch_crop_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ctypes.c_int, f32p, f32p, ctypes.c_int]
    lib.batch_crop_raw.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        ctypes.c_int, f32p, f32p, ctypes.c_int]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.batch_finish_aug.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, u8p, f32p, f64p, f32p, f32p,
        f64p, ctypes.c_int]
    lib.nyu_unpack.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None


def crop_deep_pp(depth, com, cube, paras, dsize):
    lib = load()
    depth = np.ascontiguousarray(depth, np.float32)
    out_img = np.empty((dsize, dsize), np.float32)
    out_M = np.empty((3, 3), np.float32)
    lib.crop_deep_pp(depth, depth.shape[0], depth.shape[1],
                     np.ascontiguousarray(com, np.float32),
                     np.ascontiguousarray(cube, np.float32),
                     np.ascontiguousarray(paras, np.float32),
                     dsize, out_img, out_M)
    return out_img, out_M


def batch_crop_normalize(depths, coms, cubes, paras, dsize, nthreads=4):
    lib = load()
    depths = np.ascontiguousarray(depths, np.float32)
    B, H, W = depths.shape
    out_imgs = np.empty((B, dsize, dsize), np.float32)
    out_Ms = np.empty((B, 3, 3), np.float32)
    lib.batch_crop_normalize(
        depths, B, H, W,
        np.ascontiguousarray(coms, np.float32),
        np.ascontiguousarray(cubes, np.float32),
        np.ascontiguousarray(paras, np.float32),
        dsize, out_imgs, out_Ms, nthreads)
    return out_imgs, out_Ms


def batch_crop_raw(depths, coms, cubes, paras, dsize, nthreads=4):
    """Crop WITHOUT normalization (the augmented train path warps the
    raw-depth crop before normalizing)."""
    lib = load()
    depths = np.ascontiguousarray(depths, np.float32)
    B, H, W = depths.shape
    out_imgs = np.empty((B, dsize, dsize), np.float32)
    out_Ms = np.empty((B, 3, 3), np.float32)
    lib.batch_crop_raw(
        depths, B, H, W,
        np.ascontiguousarray(coms, np.float32),
        np.ascontiguousarray(cubes, np.float32),
        np.ascontiguousarray(paras, np.float32),
        dsize, out_imgs, out_Ms, nthreads)
    return out_imgs, out_Ms


def batch_finish_aug(imgs, flags, floors, zwins, premaxes, com_zs, cube_zs,
                     nthreads=4):
    """In-place post-warp floor/z-window thresholds + depth
    normalization over a (B, S, S) stack."""
    lib = load()
    assert imgs.dtype == np.float32 and imgs.flags.c_contiguous
    B = imgs.shape[0]
    n = imgs.shape[1] * imgs.shape[2]
    lib.batch_finish_aug(
        imgs, B, n,
        np.ascontiguousarray(flags, np.uint8),
        np.ascontiguousarray(floors, np.float32),
        np.ascontiguousarray(zwins, np.float64),
        np.ascontiguousarray(premaxes, np.float32),
        np.ascontiguousarray(com_zs, np.float32),
        np.ascontiguousarray(cube_zs, np.float64), nthreads)
    return imgs


def nyu_unpack(bgr):
    lib = load()
    bgr = np.ascontiguousarray(bgr, np.uint8)
    H, W = bgr.shape[:2]
    out = np.empty((H, W), np.float32)
    lib.nyu_unpack(bgr, H, W, out)
    return out
