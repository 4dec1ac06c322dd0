"""Per-stage RTF profiling (SURVEY.md section 5 tracing row: the rebuild
reports RTF broken down as featurizer + AM + decode, since RTF is a headline
metric; plus a jax.profiler trace helper for XProf/Perfetto)."""

from __future__ import annotations

import contextlib
import time

import jax


def time_fn(fn, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median-of-iters wall time of a device function (seconds)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def rtf_breakdown(featurize, am_forward, decode, wav, wav_lens,
                  audio_seconds: float, iters: int = 5) -> dict:
    """Times each pipeline stage separately; returns seconds + x-realtime.

    Stage timings include one device sync each, so the sum slightly
    overestimates the fused end-to-end time (also reported).
    """
    t_feat = time_fn(featurize, wav, wav_lens, iters=iters)
    feats, flens = featurize(wav, wav_lens)
    t_am = time_fn(am_forward, feats, flens, iters=iters)
    logp, out_lens = am_forward(feats, flens)
    t_dec = time_fn(decode, logp, out_lens, iters=iters)

    def full(wav, wav_lens):
        f, fl = featurize(wav, wav_lens)
        lp, ol = am_forward(f, fl)
        return decode(lp, ol)

    t_e2e = time_fn(full, wav, wav_lens, iters=iters)
    mk = lambda t: {"seconds": t, "x_realtime": audio_seconds / t}
    return {"featurizer": mk(t_feat), "am": mk(t_am), "decode": mk(t_dec),
            "e2e": mk(t_e2e), "audio_seconds": audio_seconds}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
