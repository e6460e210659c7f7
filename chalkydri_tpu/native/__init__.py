"""Native (C++) runtime components: whacknet fast path, host frame pool,
V4L2 capture.

The reference's runtime leans on native code for everything around the
compute core (GStreamer C capture, C libapriltag, mimalloc — SURVEY.md
section 2.3); here the host-side runtime pieces are first-party C++ built as
one shared library and bound via ctypes (no pybind11 in this environment).

Build: ``make -C chalkydri_tpu/native`` (or automatic on first use).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libchalkydri_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build_native(force: bool = False) -> str | None:
    """Compile the shared library with make/g++. Returns the path or None."""
    if os.path.exists(_LIB_PATH) and not force:
        return _LIB_PATH
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


def load_native():
    """dlopen the native library (building it on first use). None if
    unavailable — callers fall back to pure-Python paths."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build_native()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None

        # -- whacknet ------------------------------------------------------
        lib.whacknet_start.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.whacknet_start.restype = ctypes.c_int
        lib.whacknet_send.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        lib.whacknet_send.restype = ctypes.c_int
        lib.whacknet_gyro.argtypes = [ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
        lib.whacknet_gyro.restype = ctypes.c_int
        lib.whacknet_stop.argtypes = [ctypes.c_int]
        lib.whacknet_stop.restype = None

        # -- framepool -----------------------------------------------------
        lib.framepool_create.argtypes = [ctypes.c_size_t, ctypes.c_int]
        lib.framepool_create.restype = ctypes.c_int
        lib.framepool_push.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64
        ]
        lib.framepool_push.restype = ctypes.c_int
        lib.framepool_acquire_latest.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.framepool_acquire_latest.restype = ctypes.c_int
        lib.framepool_release.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.framepool_release.restype = None
        lib.framepool_dropped.argtypes = [ctypes.c_int]
        lib.framepool_dropped.restype = ctypes.c_uint64
        lib.framepool_destroy.argtypes = [ctypes.c_int]
        lib.framepool_destroy.restype = None

        _lib = lib
        return _lib
