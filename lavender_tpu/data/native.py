"""ctypes bindings + build glue for the native data plane (native/loader.cpp).

The C++ library owns the hot host path: mmap'd TSV seek, base64, libjpeg
decode, bilinear resize + crop, with an internal thread pool.  Python stays
in charge of sampling/tokenization.  Falls back silently to the pure-Python
path when the library isn't built.
"""
from __future__ import annotations

import ctypes
import os
import os.path as op
import subprocess
from typing import Sequence

import numpy as np

_REPO_ROOT = op.dirname(op.dirname(op.dirname(op.abspath(__file__))))
_SRC = op.join(_REPO_ROOT, "native", "loader.cpp")
_LIB = op.join(_REPO_ROOT, "native", "liblvt.so")

_lib = None


def build(force: bool = False) -> str:
    """Compile native/loader.cpp -> liblvt.so (g++, -ljpeg)."""
    if op.exists(_LIB) and not force and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load(auto_build: bool = True):
    """Load (building if needed) the shared library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not op.exists(_LIB) and auto_build:
            build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None
    lib.lvt_tsv_open.restype = ctypes.c_void_p
    lib.lvt_tsv_open.argtypes = [ctypes.c_char_p]
    lib.lvt_tsv_close.argtypes = [ctypes.c_void_p]
    lib.lvt_row_num_fields.restype = ctypes.c_int
    lib.lvt_row_num_fields.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.lvt_decode_clip.restype = ctypes.c_int
    lib.lvt_decode_clip.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.lvt_decode_batch.restype = ctypes.c_int
    lib.lvt_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint32, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


class NativeTSV:
    """mmap'd TSV with parallel clip decoding."""

    def __init__(self, tsv_path: str):
        self.lib = load()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.handle = self.lib.lvt_tsv_open(tsv_path.encode())
        if not self.handle:
            raise OSError(f"cannot open {tsv_path}")

    def close(self):
        if self.handle:
            self.lib.lvt_tsv_close(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def num_fields(self, offset: int) -> int:
        return self.lib.lvt_row_num_fields(self.handle, offset)

    def decode_clip(self, offset: int, frame_cols: Sequence[int],
                    size_img: int, random_crop: bool = False,
                    seed: int = 0) -> np.ndarray:
        n = len(frame_cols)
        out = np.empty((n, size_img, size_img, 3), np.uint8)
        cols = (ctypes.c_int * n)(*frame_cols)
        r = self.lib.lvt_decode_clip(
            self.handle, offset, cols, n, size_img,
            1 if random_crop else 0, seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if r != 0:
            raise ValueError(f"native decode failed: {r}")
        return out

    def decode_batch(self, offsets: Sequence[int],
                     frame_cols: np.ndarray, size_img: int,
                     random_crop: bool = False, seed: int = 0,
                     n_threads: int = 8) -> np.ndarray:
        n_clips, n_frames = frame_cols.shape
        out = np.empty((n_clips, n_frames, size_img, size_img, 3), np.uint8)
        offs = (ctypes.c_long * n_clips)(*offsets)
        cols = np.ascontiguousarray(frame_cols, dtype=np.int32)
        r = self.lib.lvt_decode_batch(
            self.handle, offs,
            cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n_clips, n_frames, size_img, 1 if random_crop else 0, seed,
            n_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if r != 0:
            raise ValueError(f"native batch decode failed: {r}")
        return out


def available() -> bool:
    return load() is not None
