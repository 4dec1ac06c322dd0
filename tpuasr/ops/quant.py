"""Symmetric int8 quantization helpers for the inference serving path.

The v5e MXU runs int8 matmuls at 2x the bf16 rate; the GRU input
projections they feed are ~60% of the decode pipeline's FLOPs at the
headline shapes (reference scope: SURVEY.md section 2.1 DeepSpeech AM row
— the reference had no quantized path; this is a beyond-parity serving
feature, opt-in via the models' ``int8_proj`` flag and measured for WER
impact by benchmarks/wer_delta.py).

Scheme: per-output-channel symmetric weights (scale = absmax/127 per
column), per-row dynamic symmetric activations (quantized inside the
Pallas kernel — see pallas_gru.gru_scan_xfused_q8). No zero points: both
grids are symmetric, so the int32 accumulator needs no corrections.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_per_channel(w, axis: int = 0):
    """w (D, O) -> (wq int8, scale f32 (O,)) with w ~= wq * scale.

    ``axis`` is the contraction (input) axis being summed over; the scale
    is per OUTPUT channel so dequantization is a lane-wise multiply on the
    matmul result. Columns that are entirely zero get scale eps/127 and
    wq = 0 (exactly representable).
    """
    w = w.astype(jnp.float32)
    a = jnp.max(jnp.abs(w), axis=axis)
    scale = jnp.maximum(a, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[1 - axis] = -1
    wq = jnp.clip(jnp.round(w / scale.reshape(shape)), -127.0, 127.0)
    return wq.astype(jnp.int8), scale


def dequantize_per_channel(wq, scale, axis: int = 0):
    """Inverse of quantize_per_channel (for tests/inspection)."""
    shape = [1] * wq.ndim
    shape[1 - axis] = -1
    return wq.astype(jnp.float32) * scale.reshape(shape)
