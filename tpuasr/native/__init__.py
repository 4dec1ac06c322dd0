"""ctypes bindings for the host-native C++ library (native/ctc_host.cc) —
the rebuild's host-side native layer, mirroring the reference's C++
extensions (warp-ctc binding, asr/kaldi latgen binding — SURVEY.md L0).

The library is optional: `available()` gates usage, `build()` compiles it
with the in-image toolchain (g++). Device decode (tpuasr.decode) never needs
this; it exists as a CPU fallback and as an independent oracle for testing
the on-device beam search.
"""

from tpuasr.native.ctc_host import (available, build, ctc_beam_search_host,
                                    ctc_greedy_host, edit_distance_host)
from tpuasr.native.wav_batch import available as wav_batch_available
from tpuasr.native.wav_batch import load_wav_batch

__all__ = ["available", "build", "ctc_beam_search_host", "ctc_greedy_host",
           "edit_distance_host", "load_wav_batch", "wav_batch_available"]
