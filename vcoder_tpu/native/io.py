"""ctypes bindings + on-demand build for the native IO library.

See native/vcoder_io.cpp for what it does. The shared library builds once
per machine into ``~/.cache/vcoder_tpu/`` (or $VCODER_TPU_CACHE); all
entry points degrade gracefully to the PIL path when a toolchain or
libjpeg/libpng are unavailable (``is_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from vcoder_tpu.preprocess import BACKGROUND_COLOR

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    "native",
    "vcoder_io.cpp",
)

_lock = threading.Lock()
_lib = None
_build_failed = False


def _cache_dir() -> str:
    d = os.environ.get(
        "VCODER_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vcoder_tpu"),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    so_path = os.path.join(_cache_dir(), "libvcoder_io.so")
    src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
    if (
        os.path.exists(so_path)
        and os.path.getmtime(so_path) >= src_mtime
    ):
        return so_path
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", so_path, "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return so_path
    except Exception:
        return None


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.vio_load_file.restype = ctypes.c_int
        lib.vio_load_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vio_pad_resize.restype = None
        lib.vio_pad_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vio_pipeline_new.restype = ctypes.c_void_p
        lib.vio_pipeline_new.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
        ]
        lib.vio_pipeline_submit.restype = None
        lib.vio_pipeline_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p,
        ]
        lib.vio_pipeline_next.restype = ctypes.c_long
        lib.vio_pipeline_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vio_pipeline_free.restype = None
        lib.vio_pipeline_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def _bg_array(background_color) -> np.ndarray:
    return np.asarray(background_color, dtype=np.uint8)


def load_preprocessed(
    path: str,
    *,
    size: int = 336,
    pad: bool = True,
    background_color=BACKGROUND_COLOR,
) -> np.ndarray:
    """Decode + pad-to-square + bicubic-resize one file natively.
    Returns uint8 [size, size, 3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    dst = np.empty((size, size, 3), np.uint8)
    bg = _bg_array(background_color)
    rc = lib.vio_load_file(
        path.encode(),
        bg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        int(pad),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return dst


def pad_resize(
    img: np.ndarray,
    *,
    size: int = 336,
    pad: bool = True,
    background_color=BACKGROUND_COLOR,
) -> np.ndarray:
    """Native pad+resize of an in-memory uint8 [H, W, 3] image."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    dst = np.empty((size, size, 3), np.uint8)
    bg = _bg_array(background_color)
    lib.vio_pad_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        bg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        int(pad),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dst


class PrefetchPipeline:
    """Multithreaded file -> preprocessed-uint8 pipeline.

    Submit paths with ids; iterate results in completion order. One
    pipeline per dataset/loader; workers live in C++, the GIL is released
    for the entire decode+resize.
    """

    def __init__(
        self,
        n_threads: int = 4,
        *,
        size: int = 336,
        pad: bool = True,
        background_color=BACKGROUND_COLOR,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self.size = size
        bg = _bg_array(background_color)
        self._handle = lib.vio_pipeline_new(
            n_threads, size, int(pad), int(bg[0]), int(bg[1]), int(bg[2])
        )
        self._outstanding = 0

    def submit(self, job_id: int, path: str) -> None:
        self._lib.vio_pipeline_submit(
            self._handle, job_id, path.encode()
        )
        self._outstanding += 1

    def next(self) -> Tuple[int, Optional[np.ndarray]]:
        """Block for the next finished job; returns (id, pixels or None on
        decode failure)."""
        if self._outstanding == 0:
            raise RuntimeError("no outstanding jobs")
        dst = np.empty((self.size, self.size, 3), np.uint8)
        status = ctypes.c_int(0)
        jid = self._lib.vio_pipeline_next(
            self._handle,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(status),
        )
        self._outstanding -= 1
        return int(jid), (dst if status.value == 0 else None)

    def close(self) -> None:
        if self._handle:
            self._lib.vio_pipeline_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
