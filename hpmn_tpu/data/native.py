"""ctypes bindings + build for the native preprocessing core.

Compiles ``_native/fast_log.cpp`` on first use (g++, cached next to the
source; rebuilt when the source changes) and exposes

    parse_csv(path, behavior_col=-1, behavior_keep="") ->
        dict(uid, item, cat, ts, n_users, n_items, n_cats)

with interned int32 ids (item/cat 1-based, 0 = pad). Falls back cleanly:
``available()`` is False when no compiler exists, and callers keep their
pure-Python paths (tests exercise both).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "fast_log.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(_SRC), f"fast_log_{tag}.so")
    if os.path.exists(out):
        return out
    # Per-PID scratch name: concurrent builders (pytest-xdist workers on a
    # fresh tree) must not share a tmp path or one replace() consumes the
    # other's output.
    tmp = f"{out}.tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
             tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
    except (OSError, subprocess.SubprocessError):
        if os.path.exists(tmp):  # failed/timed-out compile: no orphans
            os.unlink(tmp)
        return out if os.path.exists(out) else None
    return out


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fast_parse_csv.restype = ctypes.c_void_p
    lib.fast_parse_csv.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_char_p]
    lib.fast_n_rows.restype = ctypes.c_int64
    for name in ("fast_n_users", "fast_n_items", "fast_n_cats"):
        getattr(lib, name).restype = ctypes.c_int32
    for name in ("fast_uid", "fast_item", "fast_cat", "fast_ts"):
        getattr(lib, name).restype = ctypes.c_void_p
    for name in ("fast_n_rows", "fast_n_users", "fast_n_items", "fast_n_cats",
                 "fast_uid", "fast_item", "fast_cat", "fast_ts", "fast_free"):
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_csv(path: str, behavior_col: int = -1,
              behavior_keep: str = "") -> Dict[str, np.ndarray]:
    """Parse a (user,item,cat[,behavior],ts) CSV with the native core."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocessing core unavailable "
                           "(no g++?); use the Python path")
    res = lib.fast_parse_csv(path.encode(), behavior_col,
                             behavior_keep.encode())
    if not res:
        raise FileNotFoundError(path)
    try:
        n = lib.fast_n_rows(res)

        def arr(getter, dtype):
            ptr = getter(res)
            if n == 0:
                return np.empty((0,), dtype)
            size = n * np.dtype(dtype).itemsize
            return np.frombuffer(
                ctypes.string_at(ptr, size), dtype=dtype).copy()

        return {
            "uid": arr(lib.fast_uid, np.int32),
            "item": arr(lib.fast_item, np.int32),
            "cat": arr(lib.fast_cat, np.int32),
            "ts": arr(lib.fast_ts, np.int64),
            "n_users": int(lib.fast_n_users(res)),
            "n_items": int(lib.fast_n_items(res)),
            "n_cats": int(lib.fast_n_cats(res)),
        }
    finally:
        lib.fast_free(res)
