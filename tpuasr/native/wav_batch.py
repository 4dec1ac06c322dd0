"""ctypes loader for native/libwav_batch.so — multithreaded host wav
decode (the native-IO half of the reference's dataloader workers:
torchaudio/sox C/C++ wav reading, SURVEY.md section 2.2)."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libwav_batch.so"
_lib = None
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

ERROR_NAMES = {1: "open failed", 2: "short read", 3: "not RIFF/WAVE",
               4: "missing fmt/data chunk", 5: "unsupported encoding"}


def build() -> bool:
    try:
        subprocess.run(["make", "-s", "libwav_batch.so"], cwd=_NATIVE_DIR,
                       check=True, capture_output=True)
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
    lib.wav_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, _f32p, _i32p, _i32p,
        _i32p, ctypes.c_longlong, ctypes.c_int]
    lib.wav_batch_load.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_wav_batch(paths: list[str], max_samples: int, out=None,
                   num_threads: int = 8):
    """Decode wav files in parallel -> (out (n, max_samples) f32, lens
    (n,) i32, srs (n,) i32). Rows are zero-padded past each length when
    `out` is freshly allocated (pass a zeroed buffer to reuse).

    Raises RuntimeError naming the first failing file.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native wav loader unavailable (g++ missing?)")
    n = len(paths)
    if out is None:
        out = np.zeros((n, max_samples), np.float32)
    lens = np.zeros((n,), np.int32)
    srs = np.zeros((n,), np.int32)
    errs = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.wav_batch_load(arr, n, out, lens, srs, errs,
                            max_samples, num_threads)
    if rc != 0:
        i = rc - 1
        raise RuntimeError(
            f"wav decode failed for {paths[i]}: "
            f"{ERROR_NAMES.get(int(errs[i]), errs[i])}")
    return out, lens, srs
