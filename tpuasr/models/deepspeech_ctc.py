"""DeepSpeech2-style conv + BiRNN CTC acoustic model (reference:
asr/models/deepspeech_ctc/ [M], SURVEY.md section 2.1 — 2D conv frontend over
the (freq, time) spectrogram, stacked bidirectional RNNs with batch norm, FC,
log-softmax, CTC-trained).

TPU-first design: the conv frontend runs in NHWC; each BiGRU layer does one
big input-projection matmul outside the time scan (MXU) and only the
(B,H)@(H,3H) recurrence inside (tpuasr.models.layers.GRULayer); batch norm is
masked so padded frames never pollute statistics.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpuasr.models.layers import (BiGRU, FrontConv, MaskedBatchNorm,
                                  conv_out_length, sequence_mask)


class DeepSpeechCTC(nn.Module):
    num_classes: int
    rnn_hidden: int = 512
    rnn_layers: int = 4
    conv_channels: int = 32
    dropout: float = 0.1
    axis_name: str | None = None   # for cross-device BN stats sync
    pallas_gru: bool = False       # VMEM-resident-weights GRU kernel
    bf16_gru: bool = False         # bf16 IO in the GRU kernel
    bf16_conv: bool = False        # conv frontend compute in bf16 (params
    #                                stay f32; BN statistics stay f32)
    fused_bidir: bool = False      # both directions in one kernel
    fused_proj: bool = False       # input projection inside the GRU kernel
    int8_proj: bool = False        # int8 MXU input projection; inference
    #                                only — silently ignored when train=True
    #                                (round() has zero gradient), so the same
    #                                model instance trains f32 and serves int8
    int8_rec: bool = False         # ALSO int8 recurrent matmuls (implies
    #                                int8_proj; per-step h requantization)
    # Unidirectional stack for streaming/online serving (no backward pass
    # over time, so chunks can be processed with carried GRU state).
    bidirectional: bool = True
    # Explicit symmetric conv padding instead of XLA SAME: SAME's pad split
    # depends on total T parity (anti-causal for stride 2), which makes
    # exact chunked streaming impossible. Output shapes are unchanged.
    explicit_pad: bool = False
    # Matmul-formulated conv frontend (layers.FrontConv): each time tap is
    # a full-lane (B*T, F*Cin)@(F*Cin, Fo*Cout) matmul instead of a
    # C_out=32 lane-starved conv; same params, equal up to f32 rounding.
    matmul_frontend: bool = False
    # int8 Pallas tap-GEMM for conv2 (ops/pallas_conv.py): inference only
    # (falls back to the sliding conv when train=True — rounding has zero
    # gradient), same f32 checkpoint, weights quantized per forward call.
    # conv1 keeps the sliding conv (time stride 2; ~10% of frontend FLOPs).
    int8_conv: bool = False

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False):
        # (B, T, F) -> NHWC (B, T, F, 1)
        x = feats[:, :, :, None]
        cdt = jnp.bfloat16 if self.bf16_conv else None
        # DS2-style frontend: (time, freq) kernels, total time stride 2.
        pad1 = [(5, 5), (20, 20)] if self.explicit_pad else "SAME"
        pad2 = [(5, 5), (10, 10)] if self.explicit_pad else "SAME"
        x = FrontConv(self.conv_channels, (11, 41), strides=(2, 2),
                      padding=pad1, name="conv1", dtype=cdt,
                      use_matmul=self.matmul_frontend)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name, name="conv1_bn")(x)
        x = nn.relu(x)
        out_lens = conv_out_length(feat_lens, 11, 2, "SAME")
        # Re-zero padding (BN bias makes zeros nonzero; see ResNetCTC).
        tmask = sequence_mask(out_lens, x.shape[1])[:, :, None, None]
        x = x * tmask
        x = FrontConv(self.conv_channels, (11, 21), strides=(1, 2),
                      padding=pad2, name="conv2", dtype=cdt,
                      use_matmul=self.matmul_frontend,
                      use_matmul_q8=self.int8_conv and not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.axis_name, name="conv2_bn")(x)
        x = nn.relu(x)
        x = x * tmask

        B, Tp = x.shape[0], x.shape[1]
        x = x.reshape(B, Tp, -1)          # (B, T', F' * C)
        mask = sequence_mask(out_lens, Tp)
        x = x * mask[:, :, None]

        # With the Pallas kernels the whole RNN stack (and head) runs
        # TIME-MAJOR: one transpose in, one transpose of the small (T,B,C)
        # logp out — instead of (B,T,·)<->(T,B,·) round trips inside every
        # layer. MaskedBatchNorm reduces over (batch, time) jointly, so it
        # is layout-agnostic as long as the mask matches.
        tm = self.pallas_gru
        bn_mask = mask
        T_out = Tp
        if tm:
            # Pad time ONCE to a multiple of 16 here (kernel T_BLK is a
            # power of two <= 16), so every per-layer kernel call takes its
            # aligned fast path — no pad/slice copy of the (T, B, D)
            # stream per direction per layer.
            T16 = -(-Tp // 16) * 16
            if T16 != Tp:
                x = jnp.pad(x, ((0, 0), (0, T16 - Tp), (0, 0)))
                mask = sequence_mask(out_lens, T16)
            x = jnp.transpose(x, (1, 0, 2))    # (T16, B, F'*C)
            bn_mask = jnp.transpose(mask, (1, 0))
            if self.bf16_gru:
                # bf16 end-to-end through the stack: halves the HBM
                # traffic of every elementwise pass between kernels (BN
                # affine, masks, concats). BN statistics and the head
                # stay f32.
                x = x.astype(jnp.bfloat16)

        for i in range(self.rnn_layers):
            x = MaskedBatchNorm(use_running_average=not train,
                                axis_name=self.axis_name,
                                name=f"rnn{i}_bn")(x, bn_mask)
            q8 = (self.int8_proj or self.int8_rec) and not train
            q8r = self.int8_rec and not train
            if self.bidirectional:
                x = BiGRU(self.rnn_hidden, name=f"rnn{i}",
                          use_pallas=self.pallas_gru,
                          bf16_kernel=self.bf16_gru,
                          fused_bidir=self.fused_bidir,
                          fused_proj=self.fused_proj,
                          int8_proj=q8, int8_rec=q8r,
                          time_major=tm)(x, out_lens)
            else:
                from tpuasr.models.layers import GRULayer
                x = GRULayer(self.rnn_hidden, name=f"rnn{i}",
                             use_pallas=self.pallas_gru,
                             bf16_kernel=self.bf16_gru,
                             fused_proj=self.fused_proj,
                             int8_proj=q8, int8_rec=q8r,
                             time_major=tm)(x, out_lens)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = MaskedBatchNorm(use_running_average=not train,
                            axis_name=self.axis_name,
                            name="head_bn")(x, bn_mask)
        x = nn.Dense(self.num_classes, name="head")(x.astype(jnp.float32))
        logp = nn.log_softmax(x, axis=-1)
        logp = jnp.where(bn_mask[:, :, None], logp, 0.0)
        if tm:
            logp = jnp.transpose(logp[:T_out], (1, 0, 2))
        return logp, out_lens
