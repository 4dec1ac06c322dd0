"""ResNet-CTC acoustic model (reference: asr/models/resnet_ctc/ [H-capability],
SURVEY.md section 2.1 — a ResNet-style 2D conv residual stack over the
spectrogram with a sequence output head, CTC-trained).

TPU-first design choices:
  * NHWC layout (B, T, F, C) — XLA:TPU's native conv layout;
  * time stride only in the stem (x2) so CTC keeps enough frames; freq is
    progressively pooled into channels;
  * all shapes static; valid-length arithmetic via conv_out_length;
  * final head is a (B*T', D) @ (D, C) matmul -> log_softmax.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuasr.models.layers import conv_out_length, sequence_mask


class ResBlock(nn.Module):
    channels: int
    freq_stride: int = 1

    @nn.compact
    def __call__(self, x, tmask, train: bool = False):
        # tmask (B, T', 1, 1): BN's bias turns padded zeros nonzero, and the
        # next conv's receptive field would leak them into valid frames — so
        # padding is re-zeroed between the two convs, not just between blocks.
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name=name,
            axis_name=None)
        y = nn.Conv(self.channels, (3, 3), strides=(1, self.freq_stride),
                    padding="SAME", use_bias=False, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y) * tmask
        y = nn.Conv(self.channels, (3, 3), strides=(1, 1), padding="SAME",
                    use_bias=False, name="conv2")(y)
        y = norm("bn2")(y)
        if x.shape[-1] != self.channels or self.freq_stride != 1:
            x = nn.Conv(self.channels, (1, 1),
                        strides=(1, self.freq_stride), padding="SAME",
                        use_bias=False, name="proj")(x)
            x = norm("bn_proj")(x)
        return nn.relu(x + y) * tmask


class ResNetCTC(nn.Module):
    """Spectrogram-as-image residual CNN with a CTC head."""

    num_classes: int
    stem_channels: int = 32
    stage_channels: Sequence[int] = (32, 64, 128, 256)
    blocks_per_stage: int = 2
    time_stride: int = 2      # total time downsampling (stem only)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False):
        # feats: (B, T, F) -> NHWC (B, T, F, 1)
        x = feats[:, :, :, None]
        x = nn.Conv(self.stem_channels, (5, 5),
                    strides=(self.time_stride, 2), padding="SAME",
                    use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = nn.relu(x)
        out_lens = conv_out_length(feat_lens, 5, self.time_stride, "SAME")
        # Re-zero padded frames after every stage: BN's bias maps zero input
        # to a nonzero constant which would otherwise bleed into valid frames
        # through later conv receptive fields (breaks bucketing invariance).
        tmask = sequence_mask(out_lens, x.shape[1])[:, :, None, None]
        x = x * tmask

        for si, ch in enumerate(self.stage_channels):
            for bi in range(self.blocks_per_stage):
                fs = 2 if (bi == 0 and si > 0) else 1
                x = ResBlock(ch, freq_stride=fs,
                             name=f"stage{si}_block{bi}")(x, tmask, train)

        # Collapse the remaining freq axis into channels: (B, T', F'*C)
        B, Tp = x.shape[0], x.shape[1]
        x = x.reshape(B, Tp, -1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="head")(x)
        logp = nn.log_softmax(x, axis=-1)
        mask = sequence_mask(out_lens, Tp)
        logp = jnp.where(mask[:, :, None], logp, 0.0)
        return logp, out_lens
