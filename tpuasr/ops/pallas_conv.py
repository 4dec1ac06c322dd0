"""int8 Toeplitz-GEMM conv frontend kernel (inference serving path).

The DeepSpeech conv2 ((11, 21) kernel, 32->32 channels, freq stride 2 —
reference scope: SURVEY.md section 2.1 DeepSpeech AM row) is the AM's
largest non-GRU cost and runs at ~38% MXU utilization as a sliding XLA
conv: C_out = 32 fills a quarter of the output lanes. The dense
freq-Toeplitz GEMM form fixes the lane shape (N = F_out*C_out = 512) but
carries the band-structure zeros (~1.5x FLOPs), so at f32/bf16 it LOSES to
the sliding conv (frontend_ab: 23.2 vs 33.9 ms — WORKLOG #36); the XLA
formulation also re-reads the input once per time tap. int8 changes both
terms: the MXU runs s8xs8->s32 at 2x the bf16 rate (beats the band tax),
and this Pallas kernel holds the input slab in VMEM across all Kt taps
(one HBM read, quantized once).

Scheme (matches ops/quant.py / the q8 GRU): per-output-column symmetric
int8 weights on the band matrix, per-row dynamic symmetric activations
quantized in VMEM. Each tap's int32 dot is EXACT for K*127^2 < 2^31 and
its dequant multiplier is the per-row activation scale of the rows that
tap consumed — output row i sums taps from input rows i..i+Kt-1, whose
scales differ, so dequantization happens per tap into an f32 accumulator
(the column scale factors out and is applied once at the end). All error
is the single activation rounding (weights are rounded offline).

Time stride must be 1 (conv2's case; conv1 keeps the sliding XLA conv —
its time stride is 2 and it is ~10% of the frontend FLOPs). Freq stride /
padding are folded into the band matrix exactly as in
models.layers.FrontConv(use_matmul=True).

The pure-jnp mirror ``reference_q8_conv_taps`` is the oracle: the kernel
must match it to f32 rounding (interpret tests + chip_smoke's compiled
gate), NOT to a quantization tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.ops.quant import quantize_rows

T_BLK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_im2col_kernel(Kt: int, Kd: int):
    """Single-matmul mode: the Kt tap matmuls fuse into ONE
    (T_BLK, Kt*Kd) @ (Kt*Kd, N) int8 GEMM per block — the per-tap version
    pays a fixed per-matmul cost Kt times per block plus a per-tap
    int32->f32 dequant chain that measured as expensive as the matmuls.
    Output row i's im2col row concatenates input rows i..i+Kt-1, so its
    activation scale is the WINDOWED max of the per-row absmaxes (computed
    with a chain of static sublane-shifted maxes); each segment quantizes
    directly into int8 with that scale — the f32 im2col never exists.
    """

    def kernel(x0_ref, x1_ref, mq_ref, sw_ref, out_ref, xq_ref):
        slab = jnp.concatenate([x0_ref[0], x1_ref[0][:Kt - 1]], axis=0)
        rmax = jnp.max(jnp.abs(slab), axis=1, keepdims=True)  # (T+Kt-1, 1)
        wmax = rmax[:T_BLK]
        for t in range(1, Kt):
            wmax = jnp.maximum(wmax, rmax[t:t + T_BLK])
        sx = jnp.maximum(wmax, 1e-12) * (1.0 / 127.0)         # (T_BLK, 1)
        # Segments are assembled through an int8 VMEM scratch at static
        # (vreg-aligned, Kd is a 128-multiple) lane offsets: a vector
        # concat of the sublane-SHIFTED slices is rejected by Mosaic
        # ("result/input offset mismatch on non-concat dimension" — the
        # slices carry different sublane offsets), but offset stores to a
        # ref relayout fine.
        for t in range(Kt):
            seg = jnp.clip(jnp.round(slab[t:t + T_BLK] / sx), -127.0,
                           127.0).astype(jnp.int8)
            xq_ref[:, t * Kd:(t + 1) * Kd] = seg
        acc = jax.lax.dot_general(
            xq_ref[:], mq_ref[:].reshape(Kt * Kd, -1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        out_ref[0] = acc.astype(jnp.float32) * (sx * sw_ref[:])

    return kernel


def _make_kernel(Kt: int, slab_scale: bool):
    def kernel(x0_ref, x1_ref, mq_ref, sw_ref, out_ref):
        # Slab: T_BLK output rows need input rows [0, T_BLK + Kt - 1).
        slab = jnp.concatenate([x0_ref[0], x1_ref[0][:Kt - 1]], axis=0)
        n = out_ref.shape[-1]
        if slab_scale:
            # ONE activation scale for the whole slab: every tap's int32
            # dot shares it, so the taps ACCUMULATE IN INT32 (exact for
            # Kt * K * 127^2 < 2^31) and dequantization is a single pass —
            # the per-tap int32->f32 convert+scale chain was measured to
            # cost as much as the matmuls themselves. Coarser quantization
            # (slab absmax instead of per-row), bounded by the WER gate.
            a = jnp.max(jnp.abs(slab))
            sx = jnp.maximum(a, 1e-12) * (1.0 / 127.0)
            xq = jnp.clip(jnp.round(slab / sx), -127.0, 127.0)
            xq = xq.astype(jnp.int8)
            acc = jnp.zeros((x0_ref.shape[1], n), jnp.int32)
            for t in range(Kt):
                acc = acc + jax.lax.dot_general(
                    xq[t:t + T_BLK], mq_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            out_ref[0] = acc.astype(jnp.float32) * (sx * sw_ref[:])
            return
        a = jnp.max(jnp.abs(slab), axis=1, keepdims=True)
        sx = jnp.maximum(a, 1e-12) * (1.0 / 127.0)
        # Same expression as quantize_rows (X / s, not X * (1/s)): the
        # kernel must match the jnp oracle to f32 rounding.
        xq = jnp.clip(jnp.round(slab / sx), -127.0, 127.0).astype(jnp.int8)
        acc = jnp.zeros((x0_ref.shape[1], n), jnp.float32)
        for t in range(Kt):
            d = jax.lax.dot_general(
                xq[t:t + T_BLK], mq_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32) * sx[t:t + T_BLK]
        out_ref[0] = acc * sw_ref[:]

    return kernel


@functools.lru_cache(maxsize=8)
def _build_call(B: int, Kt: int, Kd: int, N: int, n_tb: int,
                interpret: bool = False, mode: str = "im2col"):
    if mode == "im2col":
        kern = _make_im2col_kernel(Kt, Kd)
        scratch = [pltpu.VMEM((T_BLK, Kt * Kd), jnp.int8)]
    else:
        kern = _make_kernel(Kt, mode == "slab")
        scratch = []
    return pl.pallas_call(
        kern,
        scratch_shapes=scratch,
        grid=(B, n_tb),
        in_specs=[
            pl.BlockSpec((1, T_BLK, Kd), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),       # x rows, block t
            pl.BlockSpec((1, T_BLK, Kd), lambda b, t: (b, t + 1, 0),
                         memory_space=pltpu.VMEM),       # x rows, t + 1
            pl.BlockSpec((Kt, Kd, N), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),       # int8 band mats
            pl.BlockSpec((1, N), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),       # column scales
        ],
        out_specs=pl.BlockSpec((1, T_BLK, N), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tb * T_BLK, N), jnp.float32),
        interpret=interpret,
    )


def conv_taps_q8(xf, mq, sw, T_out: int, *, interpret: bool | None = None,
                 mode: str | None = None):
    """Quantized Kt-tap GEMM convolution over time.

    Args:
      xf: (B, T_in, Kd) f32 flattened (freq, channel) input rows, already
        time-padded so output row i consumes input rows i..i+Kt-1
        (T_in >= T_out + Kt - 1).
      mq: (Kt, Kd, N) int8 band matrices (per-tap freq-Toeplitz form of
        the conv kernel, quantized per output column).
      sw: (N,) f32 per-column weight scales.
      T_out: number of valid output rows.
    Returns:
      (B, T_out, N) f32 — matches ``reference_q8_conv_taps`` to f32
      rounding.
    """
    import os
    B, T_in, Kd = xf.shape
    Kt, Kd2, N = mq.shape
    if mode is None:
        # "im2col" (default): one fused int8 GEMM per block, per-output-
        # row windowed-max scales. "taps"/"slab": the recorded A/B
        # variants (per-tap matmuls with per-row or per-slab scales).
        mode = os.environ.get("TPUASR_CONV_Q8_MODE", "im2col")
    assert mode in ("im2col", "taps", "slab"), mode
    assert Kd2 == Kd and Kt - 1 <= T_BLK
    assert Kd % 128 == 0 and N % 128 == 0, (Kd, N)
    if mode == "taps":
        assert Kd * 127 * 127 < 2 ** 31, "int32 tap dot would overflow"
    else:
        assert Kt * Kd * 127 * 127 < 2 ** 31, "int32 GEMM would overflow"
    n_tb = max(1, -(-T_out // T_BLK))
    # one trailing zero block keeps the t+1 BlockSpec in range and
    # supplies the final rows' tail (zero rows quantize to zero exactly).
    need = (n_tb + 1) * T_BLK
    xf = jnp.pad(xf, ((0, 0), (0, max(0, need - T_in)), (0, 0)))[:, :need]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _build_call(B, Kt, Kd, N, n_tb, interpret, mode)
    out = call(xf, xf, mq, sw.reshape(1, N).astype(jnp.float32))
    return out[:, :T_out]


def reference_q8_conv_taps(xf, mq, sw, T_out: int, mode: str = "im2col"):
    """Pure-jnp mirror of the kernel's exact quantized math (the oracle).

    mode="im2col" (the shipped kernel): per-output-row scales from the
    windowed max of per-input-row absmaxes, every tap segment quantized
    with its output row's scale, one int8 GEMM with exact int32
    accumulation, one dequant. mode="taps": per-input-row scales, per-tap
    int8 matmuls dequantized with that row's scale.

    NOTE: blockwise evaluation changes nothing — the windowed max and the
    segment quantization depend only on rows i..i+Kt-1, so the kernel's
    T_BLK tiling is invisible (tested by the multi-block case).
    """
    B, T_in, Kd = xf.shape
    Kt, _, N = mq.shape
    need = T_out + Kt - 1
    xf = jnp.pad(xf, ((0, 0), (0, max(0, need - T_in)), (0, 0)))
    xf = xf.astype(jnp.float32)
    if mode == "im2col":
        rmax = jnp.max(jnp.abs(xf), axis=2, keepdims=True)
        wmax = rmax[:, :T_out]
        for t in range(1, Kt):
            wmax = jnp.maximum(wmax, rmax[:, t:t + T_out])
        sx = jnp.maximum(wmax, 1e-12) * (1.0 / 127.0)    # (B, T_out, 1)
        segs = [jnp.clip(jnp.round(xf[:, t:t + T_out] / sx), -127.0, 127.0)
                .astype(jnp.int8) for t in range(Kt)]
        xq = jnp.concatenate(segs, axis=2)               # (B, T, Kt*Kd)
        acc = jax.lax.dot_general(
            xq, mq.reshape(Kt * Kd, N), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * sx
                * sw.reshape(1, 1, N).astype(jnp.float32))
    assert mode == "taps", mode
    X = xf.reshape(B * xf.shape[1], Kd)
    xq, sx = quantize_rows(X)
    xq = xq.reshape(B, xf.shape[1], Kd)
    sx = sx.reshape(B, xf.shape[1], 1)
    acc = jnp.zeros((B, T_out, N), jnp.float32)
    for t in range(Kt):
        d = jax.lax.dot_general(
            xq[:, t:t + T_out], mq[t], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * sx[:, t:t + T_out]
    return acc * sw.reshape(1, 1, N).astype(jnp.float32)
