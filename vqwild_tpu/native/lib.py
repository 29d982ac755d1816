"""ctypes bindings for the native ranking engine (engine.cpp).

Builds lazily with g++ on first use (cached as _vq_native.so next to this
file); set VQWILD_NO_NATIVE=1 to force the pure-numpy fallbacks. All callers
go through ops/nms.py and retrieval/moment.py, which fall back transparently
when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "engine.cpp")


def _so_path() -> str:
    """Host-ISA-keyed build artifact: the engine compiles with
    ``-march=native``, so a .so built on one host can SIGILL on another
    (shared filesystems / container re-scheduling). Embedding the CPU
    signature in the filename makes a host swap a rebuild, not a crash."""
    from vqwild_tpu.core.hostsig import host_cpu_signature

    return os.path.join(_DIR, f"_vq_native-{host_cpu_signature()}.so")


_SO = _so_path()
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        subprocess.check_output(cmd, stderr=subprocess.STDOUT)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import sys

        print(f"vqwild native build failed: {e}", file=sys.stderr)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if os.environ.get("VQWILD_NO_NATIVE") == "1":
            _failed = True
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        i32p = ctypes.POINTER(ctypes.c_int)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.vq_version.restype = ctypes.c_int
        lib.vq_temporal_nms.restype = ctypes.c_int
        lib.vq_temporal_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.vq_moment_batch.restype = ctypes.c_int
        lib.vq_moment_batch.argtypes = [
            f32p,  # scores [Q, n]
            i32p,  # video_idx
            f32p,  # start
            f32p,  # end
            i32p,  # hit_label
            f32p,  # hit_iou
            i32p,  # q_label
            i32p,  # ignore_vids [Q, max_ig]
            ctypes.c_int,  # max_ig
            ctypes.c_int,  # Q
            ctypes.c_int,  # n
            ctypes.c_float,  # nms_thresh
            ctypes.c_float,  # tiou_thresh
            i32p,  # rn
            ctypes.c_int,  # n_rn
            ctypes.c_int,  # robust
            ctypes.c_int,  # n_threads
            f64p,  # ap_out [Q]
            f64p,  # recalls_out [Q, n_rn]
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as(arr, dtype):
    return np.ascontiguousarray(arr, dtype=dtype)


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def temporal_nms(dets: np.ndarray, thresh: float) -> List[int]:
    lib = _load()
    assert lib is not None
    dets = _as(dets, np.float32)
    keep = np.empty(dets.shape[0], np.int32)
    n = lib.vq_temporal_nms(
        _ptr(dets, ctypes.c_float), dets.shape[0], thresh, _ptr(keep, ctypes.c_int)
    )
    return keep[:n].tolist()


def moment_batch(
    scores: np.ndarray,  # [Q, n] float32
    video_idx: np.ndarray,  # [n] int32
    start_sec: np.ndarray,  # [n]
    end_sec: np.ndarray,  # [n]
    hit_label: np.ndarray,  # [n] int32 (label ids, -1 for none)
    hit_iou: np.ndarray,  # [n]
    q_label: np.ndarray,  # [Q] int32
    ignore_vids: np.ndarray,  # [Q, max_ig] int32, -1 padded
    nms_thresh: float,
    tiou_thresh: float,
    r_at_n: Sequence[int],
    robust: bool,
    n_threads: int = 8,
):
    """→ (ap [Q] f64, recalls [Q, len(r_at_n)] f64)."""
    lib = _load()
    assert lib is not None
    scores = _as(scores, np.float32)
    q, n = scores.shape
    video_idx = _as(video_idx, np.int32)
    start_sec = _as(start_sec, np.float32)
    end_sec = _as(end_sec, np.float32)
    hit_label = _as(hit_label, np.int32)
    hit_iou = _as(hit_iou, np.float32)
    q_label = _as(q_label, np.int32)
    ignore_vids = _as(ignore_vids, np.int32)
    rn = _as(list(r_at_n), np.int32)
    ap = np.empty(q, np.float64)
    recalls = np.empty((q, len(r_at_n)), np.float64)
    lib.vq_moment_batch(
        _ptr(scores, ctypes.c_float),
        _ptr(video_idx, ctypes.c_int),
        _ptr(start_sec, ctypes.c_float),
        _ptr(end_sec, ctypes.c_float),
        _ptr(hit_label, ctypes.c_int),
        _ptr(hit_iou, ctypes.c_float),
        _ptr(q_label, ctypes.c_int),
        _ptr(ignore_vids, ctypes.c_int),
        ignore_vids.shape[1],
        q,
        n,
        nms_thresh,
        tiou_thresh,
        _ptr(rn, ctypes.c_int),
        len(r_at_n),
        int(robust),
        n_threads,
        _ptr(ap, ctypes.c_double),
        _ptr(recalls, ctypes.c_double),
    )
    return ap, recalls
