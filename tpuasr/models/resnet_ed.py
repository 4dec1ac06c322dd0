"""ResNet encoder-decoder variant (reference: asr/models/resnet_ed/ [L],
SURVEY.md section 2.1 — encoder-decoder variant of the ResNet model; the
reference tags this low-confidence, so the rebuild keeps it simple and
attention-free, consistent with "no attention anywhere in the AMs").

Hybrid design so it plugs into every existing path:
  * ``__call__``  — ResNet conv encoder + CTC head, same contract as the
    other AMs ((B,T,F),(B,) -> log-probs, out_lens): predict/test/CTC
    training all work unchanged;
  * ``seq2seq``   — teacher-forced GRU decoder over label positions,
    conditioned on the masked-mean encoder summary (bridge): the ED
    objective (TrainConfig.objective="seq2seq_ce").
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuasr.models.layers import GRULayer, conv_out_length, sequence_mask
from tpuasr.models.resnet_ctc import ResBlock


class ResNetED(nn.Module):
    num_classes: int
    stem_channels: int = 32
    stage_channels: Sequence[int] = (32, 64, 128)
    blocks_per_stage: int = 2
    time_stride: int = 2
    dec_hidden: int = 256
    emb_dim: int = 128
    dropout: float = 0.1

    def _encode(self, feats, feat_lens, train):
        x = feats[:, :, :, None]
        x = nn.Conv(self.stem_channels, (5, 5),
                    strides=(self.time_stride, 2), padding="SAME",
                    use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = nn.relu(x)
        out_lens = conv_out_length(feat_lens, 5, self.time_stride, "SAME")
        tmask = sequence_mask(out_lens, x.shape[1])[:, :, None, None]
        x = x * tmask
        for si, ch in enumerate(self.stage_channels):
            for bi in range(self.blocks_per_stage):
                fs = 2 if (bi == 0 and si > 0) else 1
                x = ResBlock(ch, freq_stride=fs,
                             name=f"stage{si}_block{bi}")(x, tmask, train)
        B, Tp = x.shape[0], x.shape[1]
        enc = x.reshape(B, Tp, -1)
        return enc, out_lens

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False,
                 labels_in=None, label_lens=None):
        """Without labels_in: CTC-head AM contract (logp, out_lens).
        With labels_in (B, U): returns teacher-forced decoder logits
        (B, U, C) for seq2seq CE training."""
        enc, out_lens = self._encode(feats, feat_lens, train)
        B, Tp, D = enc.shape
        # CTC head params exist in BOTH modes so a seq2seq-trained checkpoint
        # still serves the standard predict/test (CTC/greedy) path.
        h = enc
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        ctc_logits = nn.Dense(self.num_classes, name="ctc_head")(h)
        if labels_in is None:
            logp = nn.log_softmax(ctc_logits, -1)
            mask = sequence_mask(out_lens, Tp)
            return jnp.where(mask[:, :, None], logp, 0.0), out_lens

        # --- decoder path (teacher forcing) ---
        mask = sequence_mask(out_lens, Tp).astype(enc.dtype)
        summary = (jnp.sum(enc * mask[:, :, None], axis=1)
                   / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0))
        bridge = jnp.tanh(nn.Dense(self.dec_hidden, name="bridge")(summary))
        emb = nn.Embed(self.num_classes, self.emb_dim, name="embed")(
            labels_in)
        U = labels_in.shape[1]
        ctx = jnp.repeat(bridge[:, None, :], U, axis=1)
        dec_in = jnp.concatenate([emb, ctx], axis=-1)
        if label_lens is None:
            label_lens = jnp.full((B,), U, jnp.int32)
        ys = GRULayer(self.dec_hidden, name="decoder")(dec_in, label_lens)
        logits = nn.Dense(self.num_classes, name="dec_head")(ys)
        return logits, out_lens
