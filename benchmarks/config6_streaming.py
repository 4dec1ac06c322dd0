#!/usr/bin/env python
"""Streaming serving benchmark: N concurrent real-time sessions on one chip.

The production serving shape (reference analog: online decoding loops over
Kaldi's online2 binaries): `BatchedStreamingRecognizer` advances every
active session in lockstep, one jitted program per tick. This measures the
wall-clock cost of a tick when every slot receives one CHUNK_MS chunk, and
reports the real-time capacity margin: how many times faster than real time
the server processes N concurrent streams (margin > 1 means it keeps up;
capacity ~= N * margin streams per chip at this chunk size).

Prints one JSON line (config 6 — beyond the 5 BASELINE configs; serving
latency is a headline ASR serving metric the batch configs don't cover).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit  # noqa: E402

CHUNK_MS = 100
N_STREAMS = 64
TICKS = 30


def main():
    import jax

    from tpuasr.features import FeatureConfig
    from tpuasr.models import create_model
    from tpuasr.serve.streaming import BatchedStreamingRecognizer

    sr = 8000
    chunk = sr * CHUNK_MS // 1000
    fc = FeatureConfig(sample_rate=sr, n_mels=64, cmn=False, cvn=False)
    model = create_model("deepspeech_ctc", num_classes=64, rnn_hidden=512,
                         rnn_layers=4, bidirectional=False,
                         explicit_pad=True)
    rng = np.random.default_rng(0)
    feats0 = np.zeros((2, 40, 64), np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, np.full((2,), 40, np.int32),
        train=False)

    audio = rng.standard_normal((N_STREAMS, chunk * (TICKS + 3))).astype(
        np.float32) * 0.1

    def measure(**rec_kw):
        rec = BatchedStreamingRecognizer(variables, fc,
                                         n_streams=N_STREAMS, **rec_kw)
        # Warmup: two ticks compile the per-tick programs.
        for t in range(2):
            rec.feed({i: audio[i, t * chunk:(t + 1) * chunk]
                      for i in range(N_STREAMS)})
        lat = []
        for t in range(2, 2 + TICKS):
            tick = {i: audio[i, t * chunk:(t + 1) * chunk]
                    for i in range(N_STREAMS)}
            t0 = time.perf_counter()
            rec.feed(tick)
            lat.append(time.perf_counter() - t0)
        lat = np.array(lat)
        return float(np.median(lat)), float(np.quantile(lat, 0.95))

    med, p95 = measure()
    margin = (CHUNK_MS / 1e3) / med
    detail(f"greedy tick ms: median {med * 1e3:.2f}, p95 {p95 * 1e3:.2f} "
           f"({N_STREAMS} streams, {CHUNK_MS} ms chunks)")
    bmed, bp95 = measure(decode="beam")
    detail(f"beam tick ms:   median {bmed * 1e3:.2f}, p95 {bp95 * 1e3:.2f}")
    emit(6, "streaming_tick_ms_median", med * 1e3, "ms",
         n_streams=N_STREAMS, chunk_ms=CHUNK_MS,
         p95_ms=round(p95 * 1e3, 2),
         realtime_margin=round(margin, 1),
         streams_per_chip_at_realtime=int(N_STREAMS * margin),
         beam_tick_ms=round(bmed * 1e3, 2),
         beam_realtime_margin=round((CHUNK_MS / 1e3) / bmed, 1),
         backend=jax.default_backend())


if __name__ == "__main__":
    main()
