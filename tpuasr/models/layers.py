"""Shared sequence-model building blocks (masking-aware, TPU-friendly)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """(B,) -> (B, T) bool."""
    return jnp.arange(maxlen)[None, :] < lengths[:, None]


def conv_out_length(lengths, kernel: int, stride: int, padding: str | int):
    """Output length arithmetic for a strided conv along time.

    Must match flax/XLA conv semantics exactly or CTC input_lengths go wrong
    (SURVEY.md section 7.3 item 5). 'SAME': ceil(L/stride); int p (symmetric):
    floor((L + 2p - k)/stride) + 1.
    """
    if padding == "SAME":
        return -(-lengths // stride)
    p = padding if isinstance(padding, int) else 0
    return (lengths + 2 * p - kernel) // stride + 1


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) that ignores padded frames.

    The reference models use plain BatchNorm (SURVEY.md section 2.1,
    DeepSpeech-style AM); with fixed-shape padded batches the padding would
    pollute the statistics, so stats are computed over valid positions only.
    ``axis_name`` syncs stats across data-parallel devices.
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, T, F); mask: (B, T) bool.
        feat_shape = (x.shape[-1],)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(feat_shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(feat_shape, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, feat_shape)
        bias = self.param("bias", nn.initializers.zeros, feat_shape)

        in_dtype = x.dtype
        x = x.astype(jnp.float32)   # stats/affine in f32; output re-cast —
        #                             with a bf16 stack XLA fuses the casts
        #                             into the surrounding elementwise pass
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[:, :, None].astype(x.dtype)
            cnt = jnp.sum(m)
            tot = jnp.sum(x * m, axis=(0, 1))
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                tot = jax.lax.psum(tot, self.axis_name)
            mean = tot / jnp.maximum(cnt, 1.0)
            sq = jnp.sum((x - mean) ** 2 * m, axis=(0, 1))
            if self.axis_name is not None:
                sq = jax.lax.psum(sq, self.axis_name)
            var = sq / jnp.maximum(cnt, 1.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(in_dtype)


class GRULayer(nn.Module):
    """Unidirectional GRU over time via lax.scan.

    TPU-first structure: the input projection for ALL timesteps is one big
    (B*T, D) @ (D, 3H) matmul outside the scan (MXU); only the (B, H) @ (H, 3H)
    recurrent matmul runs inside the scan. Gate order: [reset, update, new]
    (torch convention). Padded steps freeze the hidden state.
    """

    hidden: int
    reverse: bool = False
    use_pallas: bool = False   # VMEM-resident-weights Pallas scan kernel
    bf16_kernel: bool = False  # stream xp/ys/wh in bf16 (f32 gate math)
    fused_proj: bool = False   # x@Wx inside the kernel (xp never in HBM)
    int8_proj: bool = False    # int8 MXU input projection (inference only:
    #                            round() kills gradients — callers gate on
    #                            not-train; see ops/quant.py)
    int8_rec: bool = False     # ALSO run the recurrent matmul in int8
    #                            (requires int8_proj; h re-quantized per
    #                            step — chip A/B decides if it ships)
    # x is (T, B, D) and the output (T, B, H): the whole RNN stack can stay
    # time-major so the per-layer (B,T,·)<->(T,B,·) transposes disappear
    # (the kernels are time-major internally anyway).
    time_major: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        if self.time_major:
            T, B, D = x.shape
        else:
            B, T, D = x.shape
        H = self.hidden
        wx = self.param("wx", nn.initializers.lecun_normal(), (D, 3 * H))
        wh = self.param("wh", nn.initializers.orthogonal(), (H, 3 * H))
        b = self.param("b", nn.initializers.zeros, (3 * H,))
        mask = sequence_mask(lengths, T)           # (B, T)

        if self.use_pallas:
            # The kernels scan time in either direction natively, so the
            # reverse GRU needs NO reverse_sequences gathers (measured
            # ~4.8 ms per (128, 499, 1024) gather on v5e — they dominated
            # the BiGRU wrapper cost).
            cd = jnp.bfloat16 if self.bf16_kernel else x.dtype
            x_t = x if self.time_major else jnp.transpose(x, (1, 0, 2))
            mask_t = jnp.transpose(mask, (1, 0))[:, :, None].astype(
                jnp.float32)
            if self.int8_proj:
                from tpuasr.ops.pallas_gru import gru_scan_xfused_q8
                from tpuasr.ops.quant import quantize_per_channel
                # Quantizing per call is ~1.5M VPU elements at H=512 —
                # noise next to the matmul it accelerates; keeping the
                # checkpoint f32 means the same weights serve both paths.
                wxq, sw = quantize_per_channel(wx, axis=0)
                if self.int8_rec:
                    whq, swh = quantize_per_channel(wh, axis=0)
                    ys = gru_scan_xfused_q8(
                        x_t.astype(cd), wxq, sw, b, whq,
                        mask_t, self.reverse, wh_scale=swh)
                else:
                    ys = gru_scan_xfused_q8(
                        x_t.astype(cd), wxq, sw, b, wh.astype(cd),
                        mask_t, self.reverse)
            elif self.fused_proj:
                from tpuasr.ops.pallas_gru import gru_scan_xfused
                ys = gru_scan_xfused(
                    x_t.astype(cd), wx.astype(cd), b, wh.astype(cd),
                    mask_t, self.reverse)
            else:
                from tpuasr.ops import gru_scan
                # bf16 input projection: the (T*B, D) @ (D, 3H) matmul
                # runs at the MXU's bf16 rate (2x f32); gate math is f32
                # in-kernel either way.
                xp = (x_t.reshape(T * B, D).astype(cd) @ wx.astype(cd)
                      + b.astype(cd)).reshape(T, B, 3 * H)
                ys = gru_scan(xp, wh.astype(cd), mask_t, self.reverse)
            ys = ys.astype(x.dtype)
            if self.time_major:
                # Cast the f32 kernel mask down: ys * f32 would promote the
                # whole inter-layer stream to f32 and defeat the bf16
                # end-to-end HBM saving (advisor r2).
                return ys * mask_t.astype(ys.dtype)
            return jnp.transpose(ys, (1, 0, 2)) * mask[:, :, None]

        # lax.scan fallback (CPU / no-pallas): batch-major internally.
        if self.time_major:
            x = jnp.transpose(x, (1, 0, 2))
        if self.reverse:
            x = reverse_sequences(x, lengths)

        if self.bf16_kernel:
            xp = (x.reshape(B * T, D).astype(jnp.bfloat16)
                  @ wx.astype(jnp.bfloat16)
                  + b.astype(jnp.bfloat16)).reshape(B, T, 3 * H)
        else:
            xp = (x.reshape(B * T, D) @ wx + b).reshape(B, T, 3 * H)

        def step(h, inp):
            xp_t, m_t = inp
            hp = h @ wh
            r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
            n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
            h_new = (1.0 - z) * n + z * h
            h_new = jnp.where(m_t[:, None], h_new, h)
            return h_new, h_new

        h0 = jnp.zeros((B, H), x.dtype)
        xp_t = jnp.transpose(xp, (1, 0, 2))
        m_t = jnp.transpose(mask, (1, 0))
        _, ys = jax.lax.scan(step, h0, (xp_t, m_t))
        y = jnp.transpose(ys, (1, 0, 2))
        if self.reverse:
            y = reverse_sequences(y, lengths)
        y = y * mask[:, :, None]
        if self.time_major:
            return jnp.transpose(y, (1, 0, 2))
        return y


def reverse_sequences(x, lengths):
    """Reverse each row's first `lengths[b]` steps in place (padding stays)."""
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx[:, :, None], axis=1)


class BiGRU(nn.Module):
    """Bidirectional GRU: concat of forward and reverse GRULayers."""

    hidden: int
    use_pallas: bool = False
    bf16_kernel: bool = False
    fused_proj: bool = False
    int8_proj: bool = False    # see GRULayer
    int8_rec: bool = False     # see GRULayer
    time_major: bool = False   # x/out are (T, B, ·); see GRULayer
    # One kernel advancing BOTH directions in lockstep: the two per-step
    # recurrent dots are independent, so the MXU pipelines one direction's
    # matmul under the other's VPU gate math. NOTE: different checkpoint
    # param layout than the unfused path (flags are stored in ckpt meta, so
    # save/restore round-trips consistently).
    fused_bidir: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        if self.fused_bidir:
            from tpuasr.ops.pallas_gru import gru_scan_bidir
            if self.time_major:            # fused_bidir is batch-major
                x = jnp.transpose(x, (1, 0, 2))
            B, T, D = x.shape
            H = self.hidden
            mk = lambda pre: (
                self.param(f"{pre}_wx", nn.initializers.lecun_normal(),
                           (D, 3 * H)),
                self.param(f"{pre}_wh", nn.initializers.orthogonal(),
                           (H, 3 * H)),
                self.param(f"{pre}_b", nn.initializers.zeros, (3 * H,)))
            wx_f, wh_f, b_f = mk("fwd")
            wx_b, wh_b, b_b = mk("bwd")
            mask = sequence_mask(lengths, T)
            x_rev = reverse_sequences(x, lengths)
            cd = jnp.bfloat16 if self.bf16_kernel else x.dtype
            xp_f = (x.reshape(B * T, D).astype(cd) @ wx_f.astype(cd)
                    + b_f.astype(cd)).reshape(B, T, 3 * H)
            xp_b = (x_rev.reshape(B * T, D).astype(cd) @ wx_b.astype(cd)
                    + b_b.astype(cd)).reshape(B, T, 3 * H)
            ysf, ysb = gru_scan_bidir(
                jnp.transpose(xp_f, (1, 0, 2)),
                jnp.transpose(xp_b, (1, 0, 2)),
                wh_f.astype(cd), wh_b.astype(cd),
                jnp.transpose(mask, (1, 0))[:, :, None]
                .astype(jnp.float32))
            y_f = jnp.transpose(ysf, (1, 0, 2)).astype(x.dtype)
            y_b = reverse_sequences(
                jnp.transpose(ysb, (1, 0, 2)).astype(x.dtype), lengths)
            y = (jnp.concatenate([y_f, y_b], axis=-1)
                 * mask[:, :, None])
            if self.time_major:
                return jnp.transpose(y, (1, 0, 2))
            return y
        fwd = GRULayer(self.hidden, reverse=False, name="fwd",
                       use_pallas=self.use_pallas,
                       bf16_kernel=self.bf16_kernel,
                       fused_proj=self.fused_proj,
                       int8_proj=self.int8_proj,
                       int8_rec=self.int8_rec,
                       time_major=self.time_major)(x, lengths)
        bwd = GRULayer(self.hidden, reverse=True, name="bwd",
                       use_pallas=self.use_pallas,
                       bf16_kernel=self.bf16_kernel,
                       fused_proj=self.fused_proj,
                       int8_proj=self.int8_proj,
                       int8_rec=self.int8_rec,
                       time_major=self.time_major)(x, lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)


def _same_pad(n: int, k: int, s: int) -> tuple[int, int]:
    """XLA SAME padding split (extra on the high side)."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2


class FrontConv(nn.Module):
    """2-D NHWC conv with an optional MXU-shaped matmul formulation.

    Parameter layout is IDENTICAL to ``nn.Conv(features, kernel_size,
    use_bias=False)`` — one "kernel" (Kt, Kf, Cin, Cout) under this
    module's name — so checkpoints are interchangeable between modes.

    use_matmul=True reformulates the conv as Kt shifted matmuls
    (VERDICT r2 item 5): the (freq, channel) axes flatten into a dense
    (F*Cin, F_out*Cout) matrix per time tap, so instead of a conv whose
    C_out=32 occupies a quarter of the MXU's output lanes, each tap is a
    full-lane (B*T, F*Cin) @ (F*Cin, Fo*Cout) matmul (e.g. 1024 -> 512 at
    DeepSpeech shapes). ~1.5x the FLOPs of the sliding conv (the matrix
    carries the band-structure zeros) at far higher MXU utilization.
    Numerics: f32 accumulation either way; same zero padding; result equal
    to the conv up to f32 summation-order rounding.
    """

    features: int
    kernel_size: tuple
    strides: tuple
    padding: object = "SAME"          # "SAME" | [(lo,hi),(lo,hi)]
    dtype: object = None
    use_matmul: bool = False
    use_matmul_q8: bool = False       # int8 Pallas tap-GEMM (serving only;
                                      # time stride must be 1 — see
                                      # ops/pallas_conv.py)

    @staticmethod
    def band_matrices(w, F, F_out, Kf, sf, pf_lo):
        """(Kt, Kf, Cin, Cout) kernel -> (Kt, F*Cin, F_out*Cout) per-tap
        freq-Toeplitz band matrices: M[t, (fi, ci), (fo, co)] =
        w[t, fi - fo*sf + pf_lo, ci, co] where the tap index is valid,
        else 0 (out-of-range fi is the zero freq-padding, folded in)."""
        Kt = w.shape[0]
        fi = jnp.arange(F)[:, None]
        fo = jnp.arange(F_out)[None, :]
        d = fi - fo * sf + pf_lo                     # (F, F_out)
        valid = (d >= 0) & (d < Kf)
        wt = jnp.where(valid[None, :, :, None, None],
                       w[:, jnp.clip(d, 0, Kf - 1)], 0)  # (Kt,F,Fo,Ci,Co)
        return jnp.transpose(wt, (0, 1, 3, 2, 4)).reshape(
            Kt, F * w.shape[2], F_out * w.shape[3])

    @nn.compact
    def __call__(self, x):
        B, T, F, Cin = x.shape
        Kt, Kf = self.kernel_size
        st, sf = self.strides
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (Kt, Kf, Cin, self.features))
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        w = kernel.astype(dt)
        if self.padding == "SAME":
            pt, pf = _same_pad(T, Kt, st), _same_pad(F, Kf, sf)
        else:
            pt, pf = tuple(self.padding[0]), tuple(self.padding[1])
        if not (self.use_matmul or self.use_matmul_q8):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(st, sf), padding=[pt, pf],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        T_out = (T + pt[0] + pt[1] - Kt) // st + 1
        F_out = (F + pf[0] + pf[1] - Kf) // sf + 1
        N = F_out * self.features
        if self.use_matmul_q8:
            if st != 1:
                raise ValueError("use_matmul_q8 needs time stride 1 "
                                 "(ops/pallas_conv.py)")
            if (F * Cin) % 128 or N % 128:
                raise ValueError(f"use_matmul_q8 needs lane-aligned dims, "
                                 f"got K={F * Cin}, N={N}")
            from tpuasr.ops.pallas_conv import conv_taps_q8
            from tpuasr.ops.quant import quantize_per_channel
            m = self.band_matrices(kernel.astype(jnp.float32), F, F_out,
                                   Kf, sf, pf[0])
            mq, sw = quantize_per_channel(m.reshape(-1, N))
            xp = jnp.pad(x.astype(jnp.float32),
                         ((0, 0), (pt[0], pt[1]), (0, 0), (0, 0)))
            out = conv_taps_q8(xp.reshape(B, -1, F * Cin),
                               mq.reshape(Kt, F * Cin, N), sw, T_out)
            return out.reshape(B, T_out, F_out, self.features).astype(dt)
        m = self.band_matrices(w, F, F_out, Kf, sf, pf[0])
        xp = jnp.pad(x, ((0, 0), (pt[0], pt[1]), (0, 0), (0, 0)))
        xf = xp.reshape(B, T + pt[0] + pt[1], F * Cin)
        acc = jnp.zeros((B, T_out, N), jnp.float32)
        for t in range(Kt):
            xs = jax.lax.slice(
                xf, (0, t, 0), (B, t + (T_out - 1) * st + 1, F * Cin),
                (1, st, 1))                          # (B, T_out, F*Cin)
            acc = acc + jax.lax.dot_general(
                xs, m[t], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc.reshape(B, T_out, F_out, self.features).astype(dt)
