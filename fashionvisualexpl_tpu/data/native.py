"""ctypes bindings for the native C++ data plane (native/fvx_native.cpp).

Builds the shared library on first use (g++ -O3, cached next to the source;
rebuilt when the source is newer) and falls back to the pure-Python loaders
if no compiler is available.  All interfaces return numpy arrays matching
the Python implementations bit-for-bit (tested).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "fvx_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libfvx_native.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                _SRC, "-o", _SO,
            ],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SRC):
            return None
        needs_build = (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if needs_build and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.fvx_count_tsv_rows.restype = ctypes.c_long
        lib.fvx_count_tsv_rows.argtypes = [ctypes.c_char_p]
        lib.fvx_parse_interactions.restype = ctypes.c_long
        lib.fvx_parse_interactions.argtypes = [
            ctypes.c_char_p, i32p, i32p, i64p, ctypes.c_long,
        ]
        lib.fvx_max_pos_count.restype = ctypes.c_int32
        lib.fvx_max_pos_count.argtypes = [i32p, i32p, ctypes.c_long,
                                          ctypes.c_int32]
        lib.fvx_pad_positives.restype = ctypes.c_int32
        lib.fvx_pad_positives.argtypes = [
            i32p, i32p, ctypes.c_long, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i32p, i32p,
        ]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.fvx_write_recs_tsv.restype = ctypes.c_long
        lib.fvx_write_recs_tsv.argtypes = [
            ctypes.c_char_p, i32p, i32p, f32p, ctypes.c_long, ctypes.c_long,
        ]
        lib.fvx_gather_rows.restype = None
        lib.fvx_gather_rows.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, i32p,
            ctypes.c_long, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def parse_interactions_tsv(
    path: str,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(users, items, times) int arrays in file order, or None if the native
    library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    cap = lib.fvx_count_tsv_rows(path.encode())
    if cap < 0:
        raise FileNotFoundError(path)
    users = np.empty(cap, np.int32)
    items = np.empty(cap, np.int32)
    times = np.empty(cap, np.int64)
    n = lib.fvx_parse_interactions(path.encode(), users, items, times, cap)
    if n < 0:
        raise RuntimeError(f"native parse failed for {path}")
    return users[:n], items[:n], times[:n]


def pad_sorted_positives_native(
    users: np.ndarray, items: np.ndarray, num_users: int, num_items: int,
    width: Optional[int] = None,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native padded strictly-increasing positives (matches
    data/interactions.py::pad_sorted_positives)."""
    lib = load_library()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int32)
    items = np.ascontiguousarray(items, np.int32)
    if width is None:
        width = max(
            1, int(lib.fvx_max_pos_count(users, items, len(users), num_users))
        )
    padded = np.empty((num_users, width), np.int32)
    counts = np.empty(num_users, np.int32)
    rc = lib.fvx_pad_positives(
        users, items, len(users), num_users, num_items, width,
        padded.reshape(-1), counts,
    )
    if rc != 0:
        raise ValueError(
            f"width {width} < max positives (matching the Python "
            "implementation's error; truncation would corrupt sampling)"
        )
    return padded, counts


def gather_rows_native(src: np.ndarray, ids: np.ndarray,
                       out: Optional[np.ndarray] = None
                       ) -> Optional[np.ndarray]:
    """Threaded row gather `src[ids]` for a C-contiguous array or read-only
    np.memmap (the streamed trainer's host hot path — numpy fancy indexing
    copies on ONE thread).  Returns None when the native library is
    unavailable (caller falls back to `src[ids]`).

    Ids must lie in [0, n_rows): the C side clamps out-of-range ids (never
    reads wild) while numpy's `src[ids]` wraps negatives and raises on
    overflow — a caller bug would yield silently DIFFERENT features
    depending on whether the library loaded, so the range is asserted here
    before dispatch and both paths agree (invalid ids always raise)."""
    ids = np.ascontiguousarray(ids, np.int32)
    if ids.size and (
        int(ids.min()) < 0 or int(ids.max()) >= src.shape[0]
    ):
        raise IndexError(
            f"gather ids outside [0, {src.shape[0]}): "
            f"min={int(ids.min())} max={int(ids.max())}"
        )
    lib = load_library()
    if lib is None:
        return None
    if not (isinstance(src, np.ndarray) and src.flags["C_CONTIGUOUS"]):
        return None
    row_shape = src.shape[1:]
    row_bytes = int(np.prod(row_shape, dtype=np.int64)) * src.itemsize
    if out is None:
        out = np.empty((len(ids),) + row_shape, src.dtype)
    lib.fvx_gather_rows(
        src.ctypes.data_as(ctypes.c_char_p), src.shape[0], row_bytes,
        ids, len(ids), out.ctypes.data_as(ctypes.c_char_p),
    )
    return out


def write_recs_tsv(
    path: str, users: np.ndarray, ids: np.ndarray, vals: np.ndarray
) -> bool:
    """Native recommendation-dump writer: k rows `user\\titem\\tscore` per
    user (the Evaluator.store_recommendation format), formatted in parallel
    (the Python f-string loop costs tens of seconds at 10^7 rows).  Scores
    print as %.9g — float32 round-trip.  Returns False when the native
    library is unavailable (caller falls back to the Python writer)."""
    lib = load_library()
    if lib is None:
        return False
    users = np.ascontiguousarray(users, np.int32)
    ids = np.ascontiguousarray(ids, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    n, k = ids.shape
    if users.shape != (n,) or vals.shape != (n, k):
        raise ValueError(f"shape mismatch: {users.shape} {ids.shape} {vals.shape}")
    written = lib.fvx_write_recs_tsv(
        path.encode(), users, ids.reshape(-1), vals.reshape(-1), n, k
    )
    if written < 0:
        raise OSError(f"native TSV write failed for {path}")
    return True
