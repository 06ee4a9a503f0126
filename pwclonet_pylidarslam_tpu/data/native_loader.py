"""ctypes bindings for the native scan loader + a prefetching batch pipeline.

The C++ side (``native/scanio.cpp``) does the per-file hot path — parallel
file reads, format decode, fixed-count sampling — with the GIL released;
Python only orchestrates. :class:`Prefetcher` overlaps host loading with
device compute (the role of the reference's ``DataLoader(num_workers=…)``,
trainer.py:557-574).

If the shared library is absent it is built on demand (``make -C native``);
if building fails the pure-numpy fallback keeps everything working.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libscanio.so")

_lib = None
_lib_error: Optional[str] = None


def _load_library():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.scanio_load_bins.restype = ctypes.c_int64
        lib.scanio_load_bins.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int64,
        ]
        lib.scanio_load_nclt.restype = ctypes.c_int64
        lib.scanio_load_nclt.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_uint64, ctypes.c_int64,
        ]
        _lib = lib
    except Exception as exc:  # noqa: BLE001 — fall back to numpy
        _lib_error = str(exc)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def load_bins_batch(
    paths: Sequence[str],
    num_points: int,
    channels: int = 3,
    seed: int = 0,
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Load KITTI ``.bin`` scans → ``(N, num_points, channels)`` float32 plus
    per-file raw counts. Uses the C++ thread pool when available."""
    lib = _load_library()
    n = len(paths)
    out = np.zeros((n, num_points, channels), np.float32)
    counts = np.zeros((n,), np.int64)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.scanio_load_bins(
            arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_points,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            channels, seed, num_threads,
        )
        return out, counts
    # numpy fallback (same sampling semantics, slower)
    rng = np.random.default_rng(seed)
    for i, p in enumerate(paths):
        try:
            pts = np.fromfile(p, dtype=np.float32).reshape(-1, 4)
        except Exception:
            counts[i] = -1
            continue
        counts[i] = len(pts)
        if len(pts) >= num_points:
            sel = rng.choice(len(pts), num_points, replace=False)
        else:
            sel = np.concatenate(
                [np.arange(len(pts)), rng.choice(len(pts), num_points - len(pts))]
            )
        out[i] = pts[sel, :channels]
    return out, counts


def load_nclt_batch(
    paths: Sequence[str], num_points: int, seed: int = 0, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Load NCLT packed scans → ``(N, num_points, 3)`` float32 + counts."""
    lib = _load_library()
    n = len(paths)
    out = np.zeros((n, num_points, 3), np.float32)
    counts = np.zeros((n,), np.int64)
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.scanio_load_nclt(
            arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_points,
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seed, num_threads,
        )
        return out, counts
    from pwclonet_pylidarslam_tpu.data.other_datasets import nclt_decode_scan

    rng = np.random.default_rng(seed)
    for i, p in enumerate(paths):
        raw = np.fromfile(p, dtype=np.uint16)
        pts = nclt_decode_scan(raw)
        counts[i] = len(pts)
        if len(pts) >= num_points:
            sel = rng.choice(len(pts), num_points, replace=False)
        else:
            sel = np.concatenate(
                [np.arange(len(pts)), rng.choice(len(pts), num_points - len(pts))]
            )
        out[i] = pts[sel]
    return out, counts


class Prefetcher:
    """Background-thread batch prefetcher (host→device overlap).

    Wraps any batch iterator factory; keeps up to ``depth`` ready batches.
    """

    def __init__(self, batches_fn: Callable[[], Iterator], depth: int = 2):
        self.batches_fn = batches_fn
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        error: List[BaseException] = []

        def producer():
            try:
                for batch in self.batches_fn():
                    q.put(batch)
            except BaseException as exc:  # noqa: BLE001 — re-raised on consumer side
                error.append(exc)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
