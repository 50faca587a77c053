"""Mel store access: zip archives of .npy files.

The packed dataset format is identical to the reference's ``mels.zip``
(reference corpora/process_corpus.py:296-348: ZIP_STORED entries, one
``<name>.npy`` per utterance), so reference-packed data loads unchanged.

A process-wide handle cache mirrors reference dataloader.py:16-22.  When the
native reader (native/zipreader.cpp, mmap + pread, no GIL during IO) has been
built, it is used automatically for stored (uncompressed) entries.
"""

from __future__ import annotations

import io
import threading
import zipfile
from typing import Dict, Optional

import numpy as np

_zip_cache: Dict[str, "ZipStore"] = {}
_cache_lock = threading.Lock()


def load_zip(filename: str) -> "ZipStore":
    with _cache_lock:
        if filename not in _zip_cache:
            _zip_cache[filename] = ZipStore(filename)
        return _zip_cache[filename]


class ZipStore:
    """Thread-safe reader of npy entries from a zip archive."""

    def __init__(self, filename: str):
        self.filename = filename
        self._zf = zipfile.ZipFile(filename)
        self._lock = threading.Lock()
        self._native = None
        try:
            from ..native import zipreader
            self._native = zipreader.NativeZipReader(filename)
        except Exception:
            self._native = None

    def namelist(self):
        return self._zf.namelist()

    def read_npy(self, name: str) -> np.ndarray:
        if self._native is not None:
            buf = self._native.read(name)
            if buf is not None:
                return np.load(io.BytesIO(buf))
        with self._lock:
            data = self._zf.read(name)
        return np.load(io.BytesIO(data))

    # reference-compatible alias (dataloader.py:413-416)
    def load(self, npy_name: str) -> np.ndarray:
        return self.read_npy(npy_name)
