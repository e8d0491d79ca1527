"""ctypes bindings for the native batch-assembly core (_native/batcher.cpp).

Same build-on-first-use protocol as ``data.native``: compiled with g++ on
first call, cached by source hash, clean fallback (``available()`` False →
callers keep the numpy fancy-indexing path). ``gather(arrays, idx)``
assembles one batch — all fields in a single native call that releases the
GIL and fans rows out over a persistent thread pool.

Why: single-threaded numpy assembly ceilings at ~110k examples/s on XLong
shapes; a host feeding several chips of the DP mesh needs more (numbers in
tools/bench_loader.py; design note in the .cpp header).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Dict, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "_native", "batcher.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(os.path.dirname(_SRC), f"batcher_{tag}.so")
    if os.path.exists(out):
        return out
    # Per-PID scratch name: concurrent builders (pytest-xdist workers on a
    # fresh tree) must not share a tmp path or one replace() consumes the
    # other's output.
    tmp = f"{out}.tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", tmp],
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
    lib.batcher_gather.restype = None
    lib.batcher_gather.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.batcher_n_threads.restype = ctypes.c_int
    lib.batcher_n_threads.argtypes = []
    _LIB = lib
    return lib


def available() -> bool:
    if os.environ.get("HPMN_TPU_NO_NATIVE_BATCHER"):
        return False
    return _load() is not None


def n_threads() -> int:
    lib = _load()
    return int(lib.batcher_n_threads()) if lib else 0


def _eligible(a: np.ndarray) -> bool:
    return a.flags["C_CONTIGUOUS"] and a.ndim in (1, 2) and a.itemsize > 0


def gather(arrays: Dict[str, np.ndarray], idx: np.ndarray,
           order: Optional[Sequence[str]] = None) -> Dict[str, np.ndarray]:
    """{name: [N, ...]} + idx [B] -> {name: [B, ...]} — one native call.

    Non-contiguous / >2-D fields (none in the Batch schema today) fall back
    to numpy per-field. Raises if the core is unavailable; callers gate on
    ``available()``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native batcher unavailable (no g++?)")
    idx = np.asarray(idx)
    if idx.size and int(idx.max(initial=0)) > np.iinfo(np.int32).max:
        raise ValueError("native batcher indexes with int32; dataset has "
                         f"rows beyond 2^31 ({int(idx.max())})")
    idx = np.ascontiguousarray(idx, np.int32)
    names = list(order) if order is not None else list(arrays)
    native = [n for n in names if _eligible(arrays[n])]
    if idx.size and native:
        # The C++ core does raw pointer reads — out-of-range indices must
        # keep numpy's loud/defined semantics (IndexError / negative
        # wraparound), not silently read adjacent memory. Any such index
        # routes the whole call to the numpy oracle path.
        lo, hi = int(idx.min()), int(idx.max())
        if lo < 0 or hi >= min(arrays[n].shape[0] for n in native):
            native = []
    out: Dict[str, np.ndarray] = {
        n: arrays[n][idx] for n in names if n not in native}  # fallback
    if not native:
        return out
    b = idx.shape[0]
    srcs = (ctypes.c_void_p * len(native))()
    dsts = (ctypes.c_void_p * len(native))()
    row_bytes = (ctypes.c_int64 * len(native))()
    for i, n in enumerate(native):
        a = arrays[n]
        o = np.empty((b,) + a.shape[1:], a.dtype)
        out[n] = o
        srcs[i] = a.ctypes.data
        dsts[i] = o.ctypes.data
        row_bytes[i] = a.dtype.itemsize * int(np.prod(a.shape[1:], dtype=np.int64))
    lib.batcher_gather(len(native), srcs, dsts, row_bytes,
                       idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                       b)
    return out
