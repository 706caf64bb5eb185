"""ctypes bindings for the native corpus parser (native/fast_corpus.cpp).

Compiled on first use with g++ (cached as native/libfastcorpus.so); every
entry point degrades gracefully to the pure-Python loader when the toolchain
or the schema assumption fails.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfastcorpus.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "fast_corpus.cpp")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO_PATH) and not (
                os.path.exists(_SRC_PATH) and _build()):
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.fc_parse.restype = ctypes.c_void_p
            lib.fc_parse.argtypes = [ctypes.c_char_p]
            for name in ("fc_count", "fc_dim", "fc_id_bytes", "fc_text_bytes"):
                getattr(lib, name).restype = ctypes.c_long
                getattr(lib, name).argtypes = [ctypes.c_void_p]
            lib.fc_fill.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float)]
            lib.fc_ids.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.fc_texts.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.fc_free.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _failed = True
        return _lib


def parse_corpus(path: str) -> Optional[Tuple[np.ndarray, list, list]]:
    """Parse a corpus JSON natively. Returns (embeddings f32[n, d], ids,
    texts) or None when the native path is unavailable/doesn't match."""
    lib = get_lib()
    if lib is None:
        return None
    h = lib.fc_parse(path.encode())
    if not h:
        return None
    try:
        n, d = lib.fc_count(h), lib.fc_dim(h)
        emb = np.empty((n, d), np.float32)
        lib.fc_fill(h, emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        ib = lib.fc_id_bytes(h)
        idbuf = ctypes.create_string_buffer(ib)
        lib.fc_ids(h, idbuf)
        ids = idbuf.raw[:ib].decode("utf-8", "replace").split("\n")
        tb = lib.fc_text_bytes(h)
        txbuf = ctypes.create_string_buffer(max(tb, 1))
        lib.fc_texts(h, txbuf)
        texts = txbuf.raw[:tb].decode("utf-8", "replace").split("\n") \
            if tb else [""] * n
        if len(ids) != n or len(texts) != n:
            return None
        return emb, ids, texts
    finally:
        lib.fc_free(h)
