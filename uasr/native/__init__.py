"""ctypes bindings for the native host runtime (libuasr_native.so).

Owned C++ replacements for the native code the reference borrowed
(SURVEY.md §2.1): the `editdistance` C extension (bulk PER/CER scoring)
and tf.data's C++ input runtime (parallel WAV decode + pad). Built with
`make -C uasr/native` (attempted automatically on first import); every
entry point has a pure-Python fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libuasr_native.so")
_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load(auto_build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.batch_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.batch_read_wavs.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.read_wav_pcm16.restype = ctypes.c_int64
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def batch_edit_distance_native(
    refs: np.ndarray, ref_lens: np.ndarray,
    hyps: np.ndarray, hyp_lens: np.ndarray,
    num_threads: int = 0,
) -> np.ndarray:
    """Host-side batched Levenshtein. Falls back to Python if the native
    lib is unavailable."""
    refs = np.ascontiguousarray(refs, np.int32)
    hyps = np.ascontiguousarray(hyps, np.int32)
    ref_lens = np.ascontiguousarray(ref_lens, np.int32)
    hyp_lens = np.ascontiguousarray(hyp_lens, np.int32)
    B, N = refs.shape
    M = hyps.shape[1]
    out = np.zeros(B, np.int32)
    lib = load()
    if lib is None:
        for b in range(B):
            out[b] = _py_lev(
                refs[b, : ref_lens[b]].tolist(), hyps[b, : hyp_lens[b]].tolist()
            )
        return out
    lib.batch_edit_distance(
        _i32p(refs), _i32p(ref_lens), _i32p(hyps), _i32p(hyp_lens),
        B, N, M, _i32p(out), num_threads,
    )
    return out


def _py_lev(a, b):
    dp = list(range(len(a) + 1))
    for i, y in enumerate(b, 1):
        new = [i]
        for j, x in enumerate(a, 1):
            new.append(min(dp[j] + 1, new[j - 1] + 1, dp[j - 1] + (x != y)))
        dp = new
    return dp[len(a)]


def batch_read_wavs_native(
    paths: list[str], max_samples: int, num_threads: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel WAV decode into a padded [B, max_samples] float32 batch.
    Returns (audio, lengths, sample_rates); length -1 marks a failed file.
    Falls back to the Python wave reader without the native lib."""
    B = len(paths)
    out = np.zeros((B, max_samples), np.float32)
    lengths = np.zeros(B, np.int64)
    rates = np.zeros(B, np.int32)
    lib = load()
    if lib is None:
        from uasr.data.io import read_wav

        for b, p in enumerate(paths):
            try:
                a, sr = read_wav(p)
                n = min(len(a), max_samples)
                out[b, :n] = a[:n]
                lengths[b] = n
                rates[b] = sr
            except Exception:
                lengths[b] = -1
        return out, lengths, rates
    blob = b"".join(p.encode() + b"\0" for p in paths)
    offsets = np.zeros(B, np.int64)
    pos = 0
    for b, p in enumerate(paths):
        offsets[b] = pos
        pos += len(p.encode()) + 1
    lib.batch_read_wavs(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _i32p(rates), num_threads,
    )
    return out, lengths, rates
