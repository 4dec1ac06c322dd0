"""Per-stage RTF profiling (SURVEY.md section 5 tracing row: the rebuild
reports RTF broken down as featurizer + AM + decode, since RTF is a headline
metric; plus a jax.profiler trace helper for XProf/Perfetto)."""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def _drain(out) -> None:
    """Force TRUE completion of everything queued on the device.

    Under the axon TPU terminal, dispatch can run in an async-lazy mode
    where jax.block_until_ready returns before execution finishes (measured:
    a 23 ms AM step "completed" in 0.09 ms). A host transfer of any output
    element drains the execution queue in every mode, so timings stay
    honest. np.asarray on a small slice keeps the transfer itself cheap."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))


def time_fn(fn, *args, iters: int = 20, warmup: int = 2) -> float:
    """Sustained per-call wall time (seconds): queue `iters` calls, then
    drain with a host transfer, total/iters. Per-call sync would both pay
    the terminal's per-dispatch RPC (~2 ms, dwarfing sub-ms kernels) and
    be fooled by async-lazy mode (see _drain); queue-then-drain measures
    the device-serialized execution rate in either mode."""
    out = fn(*args)
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters


def rtf_breakdown(featurize, am_forward, decode, wav, wav_lens,
                  audio_seconds: float, iters: int = 20,
                  with_roofline: bool = True) -> dict:
    """Times each pipeline stage separately; returns seconds + x-realtime,
    plus per-stage roofline accounting (flops, bytes, MFU — see roofline()).

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
    out = {"featurizer": mk(t_feat), "am": mk(t_am), "decode": mk(t_dec),
           "e2e": mk(t_e2e), "audio_seconds": audio_seconds}
    if with_roofline:
        for name, fn, args, t in (
                ("featurizer", featurize, (wav, wav_lens), t_feat),
                ("am", am_forward, (feats, flens), t_am),
                ("decode", decode, (logp, out_lens), t_dec)):
            try:
                out[name]["roofline"] = roofline(fn, args, t)
            except Exception as e:           # cost analysis is best-effort
                out[name]["roofline"] = {"error": str(e)}
    return out


# Per-chip peaks for roofline accounting, keyed by a substring of
# jax.Device.device_kind: (bf16 FLOP/s, HBM bytes/s). v5e ("TPU v5 lite"):
# 197 bf16 TFLOP/s, 819 GB/s HBM (public spec; f32 matmuls run at half the
# bf16 rate on the MXU, so MFU for an f32-heavy program tops out near 0.5).
DEVICE_PEAKS = {
    "tpu v5 lite": (197e12, 819e9),
    "tpu v5e": (197e12, 819e9),
    "tpu v4": (275e12, 1228e9),
    "tpu v5p": (459e12, 2765e9),
    "tpu v6 lite": (918e12, 1640e9),
}


def device_peaks(device=None):
    """(peak_flops, peak_bytes_per_s) for the device, or None if unknown."""
    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key, peaks in DEVICE_PEAKS.items():
        if key in kind:
            return peaks
    return None


def cost_analysis(fn, *args) -> dict:
    """XLA-estimated {'flops', 'bytes'} of ``fn`` at these args.

    ``fn`` may be a jitted callable or a plain one (it is jitted here).
    Estimates come from the compiled HLO's cost analysis — the same numbers
    XLA's scheduler uses; custom-call ops (Pallas kernels) count as 0 flops,
    so programs dominated by hand-written kernels under-report (flagged by
    callers via the 'estimated' field).
    """
    if not hasattr(fn, "lower"):
        fn = jax.jit(fn)
    c = fn.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    c = c or {}
    return {"flops": float(c.get("flops", 0.0)),
            "bytes": float(c.get("bytes accessed", 0.0))}


def roofline(fn, args, seconds: float, flops: float = None,
             bytes_accessed: float = None) -> dict:
    """Roofline accounting for one timed program (VERDICT r1 item 4).

    Returns achieved FLOP/s and HBM bandwidth, and — when the device peaks
    are known — MFU, bandwidth fraction, the roofline-attainable rate at
    this arithmetic intensity, and the fraction of it achieved ('bound'
    says which wall you are under). ``flops``/``bytes_accessed`` override
    the XLA estimate (e.g. analytic counts for Pallas-kernel programs).
    """
    est = None
    if flops is None or bytes_accessed is None:
        est = cost_analysis(fn, *args)
    flops = est["flops"] if flops is None else flops
    bytes_accessed = (est["bytes"] if bytes_accessed is None
                      else bytes_accessed)
    out = {
        "flops": flops,
        "bytes": bytes_accessed,
        "seconds": seconds,
        "achieved_tflops": flops / seconds / 1e12,
        "achieved_gbps": bytes_accessed / seconds / 1e9,
        "estimated": est is not None,
    }
    if bytes_accessed > 0:
        out["arith_intensity"] = flops / bytes_accessed
    peaks = device_peaks()
    if peaks and flops > 0 and bytes_accessed > 0:
        peak_f, peak_b = peaks
        ai = flops / bytes_accessed
        attainable = min(peak_f, ai * peak_b)
        out.update(
            mfu=flops / seconds / peak_f,
            hbm_frac=bytes_accessed / seconds / peak_b,
            bound="compute" if ai * peak_b >= peak_f else "memory",
            attainable_tflops=attainable / 1e12,
            roofline_frac=flops / seconds / attainable,
        )
    return out


def gru_param_flops(params, batch: int, t_out: int) -> float:
    """Analytic matmul FLOPs of the recurrent layers for one forward pass.

    XLA's cost analysis counts Pallas kernels (custom calls) as 0 FLOPs, so
    programs using the Pallas GRU under-report; this walks the param tree
    for the recurrence weights (leaves named *wx / *wh) and counts
    2 * B * T * |W| each — pass the sum as roofline(flops=...) correction.
    """
    import jax.tree_util as jtu
    total = 0.0
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        name = jtu.keystr(path[-1:]).strip("[]'\"")
        if name.endswith("wx") or name.endswith("wh"):
            total += 2.0 * batch * t_out * leaf.size
    return total


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
