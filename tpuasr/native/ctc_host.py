"""ctypes loader + numpy-typed wrappers for native/libctc_host.so."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libctc_host.so"
_lib = None

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def build() -> bool:
    """Compile the native library with the in-image toolchain."""
    try:
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ctc_beam_search.argtypes = [
        _f32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _i32p, _i32p, _f32p]
    lib.ctc_beam_search.restype = None
    lib.ctc_greedy.argtypes = [
        _f32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _i32p, _i32p]
    lib.ctc_greedy.restype = None
    lib.edit_distance.argtypes = [_i32p, ctypes.c_int, _i32p, ctypes.c_int]
    lib.edit_distance.restype = ctypes.c_int32
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def ctc_beam_search_host(log_probs, lengths, beam_width: int = 16,
                         class_topk: int = 8, blank: int = 0,
                         max_len: int = 256):
    """Exact host prefix beam search. log_probs: (B, T, C) float32.

    Returns dict(tokens (B, max_len) i32 pad -1, token_lens (B,), scores (B,)).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (build failed?)")
    log_probs = np.ascontiguousarray(log_probs, np.float32)
    lengths = np.ascontiguousarray(lengths, np.int32)
    B, T, C = log_probs.shape
    tokens = np.full((B, max_len), -1, np.int32)
    tok_lens = np.zeros((B,), np.int32)
    scores = np.zeros((B,), np.float32)
    lib.ctc_beam_search(log_probs, lengths, B, T, C, beam_width, class_topk,
                        blank, max_len, tokens, tok_lens, scores)
    return dict(tokens=tokens, token_lens=tok_lens, scores=scores)


def ctc_greedy_host(log_probs, lengths, blank: int = 0):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (build failed?)")
    log_probs = np.ascontiguousarray(log_probs, np.float32)
    lengths = np.ascontiguousarray(lengths, np.int32)
    B, T, C = log_probs.shape
    tokens = np.full((B, T), -1, np.int32)
    tok_lens = np.zeros((B,), np.int32)
    lib.ctc_greedy(log_probs, lengths, B, T, C, blank, tokens, tok_lens)
    return tokens, tok_lens


def edit_distance_host(a, b) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (build failed?)")
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    return int(lib.edit_distance(a, len(a), b, len(b)))
