"""ctypes bindings for the native WAV codec / batch reader (wavio.cpp).

Build model: compile-on-first-use. The shared library is built with g++ into
a cache directory keyed by the source hash, so editing wavio.cpp invalidates
the cache and `pip install` needs no compile step. ctypes (not pybind11/C
API) keeps the binding dependency-free.

Scaling note: sfs_wav_read_batch fills a whole [N, T] f32 training batch
with an internal std::thread pool doing seek+decode per file — the host-side
equivalent of the reference's torch DataLoader worker processes
(dataloader.py num_workers), without pickling or process fan-out.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).with_name("wavio.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ERRORS = {
    -1: "cannot open file",
    -2: "unsupported or malformed WAV",
    -3: "seek failed",
    -4: "short read",
    -5: "write failed",
    -6: "bad arguments",
}


def _cache_dir() -> Path:
    root = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return Path(root) / "spiking_fullsubnet_tpu"


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"wavio_{tag}.so"
    if not out.exists():
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".so.tmp")
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-shared",
            "-fPIC",
            "-std=c++17",
            "-pthread",
            str(_SRC),
            "-o",
            str(tmp),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            logger.info(f"native wavio build unavailable ({e}); using scipy IO")
            return None
        os.replace(tmp, out)
    try:
        lib = ctypes.CDLL(str(out))
    except OSError as e:
        logger.info(f"native wavio load failed ({e}); using scipy IO")
        return None

    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    lib.sfs_wav_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(t) for t in (
        ctypes.c_int, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int)]
    lib.sfs_wav_info.restype = ctypes.c_int
    lib.sfs_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.sfs_wav_read.restype = ctypes.c_int
    lib.sfs_wav_read_batch.argtypes = [
        c_char_pp, ctypes.c_int, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sfs_wav_read_batch.restype = ctypes.c_int
    lib.sfs_wav_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.sfs_wav_write.restype = ctypes.c_int
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            if os.environ.get("SFS_TPU_NATIVE_IO", "1") != "0":
                _LIB = _build()
            globals()["_TRIED"] = True
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def _check(rc: int, path=""):
    if rc != 0:
        raise IOError(f"native wavio: {_ERRORS.get(rc, rc)} ({path})")


def wav_info(path) -> Tuple[int, int, int, int, int]:
    """(sample_rate, frames, channels, bits, format) for a WAV file."""
    lib = _lib()
    assert lib is not None
    sr = ctypes.c_int()
    frames = ctypes.c_long()
    ch = ctypes.c_int()
    bits = ctypes.c_int()
    fmt = ctypes.c_int()
    rc = lib.sfs_wav_info(str(path).encode(), sr, frames, ch, bits, fmt)
    _check(rc, path)
    return sr.value, frames.value, ch.value, bits.value, fmt.value


def wav_read(path, offset: int = 0, frames: int = -1,
             pad_to: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """Read a float32 window [T] (mono) or [C, T].

    frames=-1 reads to EOF; pad_to zero-pads the tail to a fixed length
    (the training-crop contract of dsp/io.subsample).
    """
    lib = _lib()
    assert lib is not None
    sr0, total, ch, _, _ = wav_info(path)
    want = (total - offset) if frames < 0 else frames
    want = max(want, 0)
    alloc = max(want, pad_to or 0)
    out = np.zeros(alloc * ch, dtype=np.float32)
    sr = ctypes.c_int()
    chans = ctypes.c_int()
    got = ctypes.c_long()
    tot = ctypes.c_long()
    rc = lib.sfs_wav_read(
        str(path).encode(), offset, want,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), sr, chans, got, tot)
    _check(rc, path)
    y = out.reshape(alloc, ch)
    y = y[:, 0] if ch == 1 else y.T
    return np.ascontiguousarray(y), sr.value


def read_batch(paths: Sequence, offsets: Sequence[int], frames: int,
               num_threads: int = 8) -> np.ndarray:
    """Threaded batched crop read: returns [N, frames] float32 (mono files),
    zero-padded past EOF. One native call fills the whole batch."""
    lib = _lib()
    assert lib is not None
    n = len(paths)
    if n == 0:
        return np.zeros((0, frames), np.float32)
    enc = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*enc)
    offs = np.asarray(offsets, dtype=np.int64)
    assert offs.shape == (n,)
    out = np.zeros((n, frames), dtype=np.float32)
    rcs = np.zeros(n, dtype=np.int32)
    rc = lib.sfs_wav_read_batch(
        ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)), n,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), frames, 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        bad = [str(paths[i]) for i in np.nonzero(rcs)[0][:3]]
        raise IOError(f"native wavio batch read failed ({_ERRORS.get(rc, rc)}): {bad}")
    return out


def wav_write(path, data: np.ndarray, sr: int, as_float: bool = False):
    """Write [T] or [C, T] float32 as PCM16 (default) or IEEE float32."""
    lib = _lib()
    assert lib is not None
    y = np.asarray(data, dtype=np.float32)
    if y.ndim == 1:
        frames, ch = y.shape[0], 1
        inter = np.ascontiguousarray(y)
    else:
        ch, frames = y.shape
        inter = np.ascontiguousarray(y.T)
    rc = lib.sfs_wav_write(
        str(path).encode(), inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, ch, int(sr), int(as_float))
    _check(rc, path)
