"""ctypes binding for the native zip reader (zipreader.cpp).

Compiled on first use with g++ into the user cache dir; ZipStore falls back to
Python zipfile when the toolchain or the entry encoding (deflate) requires it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "zipreader.cpp")
    cache_dir = os.environ.get(
        "FSTTS_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "fstts_native"))
    os.makedirs(cache_dir, exist_ok=True)
    tag = hashlib.sha256(open(src, "rb").read()).hexdigest()[:16]
    out = os.path.join(cache_dir, "libzipreader_%s.so" % tag)
    if os.path.exists(out):
        return out
    tmp = out + ".build.%d" % os.getpid()
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                        "-o", tmp, src], check=True, capture_output=True)
        os.replace(tmp, out)
        return out
    except Exception:
        return None


def _get_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            path = _build_library()
            if path is None:
                _lib = False
                return None
            lib = ctypes.CDLL(path)
            lib.zr_open.restype = ctypes.c_void_p
            lib.zr_open.argtypes = [ctypes.c_char_p]
            lib.zr_close.argtypes = [ctypes.c_void_p]
            lib.zr_size.restype = ctypes.c_long
            lib.zr_size.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.zr_read.restype = ctypes.c_long
            lib.zr_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_long]
            lib.zr_count.restype = ctypes.c_long
            lib.zr_count.argtypes = [ctypes.c_void_p]
            lib.zr_names.restype = ctypes.c_long
            lib.zr_names.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_long]
            _lib = lib
        return _lib if _lib is not False else None


class NativeZipReader:
    """Lock-free reads of stored zip entries via positioned pread."""

    def __init__(self, path: str):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native zip reader unavailable")
        self._lib = lib
        self._handle = lib.zr_open(path.encode())
        if not self._handle:
            raise RuntimeError("failed to open zip: %s" % path)

    def read(self, name: str) -> Optional[bytes]:
        """Entry bytes, or None when the entry needs the Python fallback
        (missing or deflated)."""
        size = self._lib.zr_size(self._handle, name.encode())
        if size < 0:
            return None
        buf = ctypes.create_string_buffer(size)
        n = self._lib.zr_read(self._handle, name.encode(), buf, size)
        if n != size:
            return None
        return buf.raw

    def namelist(self):
        cap = 1 << 20
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.zr_names(self._handle, buf, cap)
            if n == -4:
                cap *= 4
                continue
            return buf.raw[:n].decode().splitlines() if n > 0 else []

    def __len__(self):
        return int(self._lib.zr_count(self._handle))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.zr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
