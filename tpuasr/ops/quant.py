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


def quantize_rows(x):
    """Symmetric per-row dynamic int8 — the ACTIVATION quantizer the q8
    GRU kernel applies in VMEM. (rows, D) f32 -> (int8, scales (rows, 1));
    zero rows get scale eps/127 and quantize to 0."""
    a = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(a, 1e-12) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def reference_q8_gru_scan(x, wxq, sw, b, wh, mask, reverse=False,
                          wh_scale=None):
    """Pure-jnp reference of ``gru_scan_xfused_q8`` — the SAME quantized
    math (per-row dynamic activations, int8 matmuls, exact int32 dequant,
    f32 gates), expressed as a lax.scan. The Pallas kernel must match this
    to floating-point rounding, NOT to a quantization tolerance — the
    oracle for tests (interpret) and chip_smoke (Mosaic lowering).
    """
    import jax
    import jax.numpy as jnp  # noqa: F811 - keep self-contained

    T, B, D = x.shape
    H = wh.shape[0]
    sw = sw.astype(jnp.float32)[None, :]
    b2 = b.astype(jnp.float32)[None, :]

    X = x.reshape(T * B, D).astype(jnp.float32)
    xq, sx = quantize_rows(X)
    acc = jax.lax.dot(xq, wxq, preferred_element_type=jnp.int32)
    xp = (acc.astype(jnp.float32) * sx * sw + b2).reshape(T, B, 3 * H)

    def step(h, inp):
        xp_t, m_t = inp
        if wh_scale is not None:
            hq, sh = quantize_rows(h)
            hacc = jax.lax.dot(hq, wh, preferred_element_type=jnp.int32)
            hp = (hacc.astype(jnp.float32) * sh
                  * wh_scale.astype(jnp.float32)[None, :])
        else:
            hp = jnp.dot(h.astype(wh.dtype), wh,
                         preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
        n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
        h_new = (1.0 - z) * n + z * h
        h2 = m_t * h_new + (1.0 - m_t) * h
        return h2, h2

    xp_seq = xp[::-1] if reverse else xp
    m_seq = (mask.astype(jnp.float32)[::-1] if reverse
             else mask.astype(jnp.float32))
    h0 = jnp.zeros((B, H), jnp.float32)
    _, ys = jax.lax.scan(step, h0, (xp_seq, m_seq))
    if reverse:
        ys = ys[::-1]
    return ys.astype(x.dtype)
