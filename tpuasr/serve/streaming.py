"""Chunked, stateful streaming recognizer for the unidirectional DeepSpeech
variant (DeepSpeechCTC(bidirectional=False, explicit_pad=True)).

Design for exactness (streaming output == offline forward on the full
audio, verified in tests/test_streaming.py):

  * featurizer: snip-edges framing is causal given (win - hop) sample
    lookahead — leftover samples carry across chunks; CMVN must be off
    (per-utterance statistics are anti-causal by definition);
  * conv frontend: the model variant uses explicit symmetric time padding
    (5, 5) (XLA SAME's split depends on total-length parity — anti-causal
    for stride 2). The stream prepends the 5 zero context frames once,
    carries a rolling input buffer per conv layer, emits an output as soon
    as its full receptive field is buffered, and flush() appends the right
    zero padding;
  * BatchNorm (eval): running stats, purely elementwise — stream-safe;
  * GRU layers: unidirectional scan with the hidden state carried across
    chunks — exact by construction;
  * greedy CTC collapse with the previous emission carried across chunks.

Latency: 5 conv1 input frames (50 ms) + 5 conv2 frames (100 ms) lookahead
plus the chunk size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.features import FeatureConfig
from tpuasr.features import functional as F


class StreamingRecognizer:
    """Feed 1-D float32 sample chunks; receive incremental token ids.

    Single-utterance, batch-1 (serving fan-out batches across instances).
    """

    def __init__(self, variables, feat_cfg: FeatureConfig, blank: int = 0,
                 decode: str = "greedy", beam_cfg=None):
        """decode: "greedy" (incremental emissions via feed()) or "beam"
        (resumable prefix beam search across chunks; read hypothesis() /
        flush() — beam hypotheses may revise earlier output, so per-chunk
        emissions would be unstable by nature)."""
        c = feat_cfg
        if c.cmn or c.cvn:
            raise ValueError("streaming requires cmn=False, cvn=False "
                             "(per-utterance CMVN is anti-causal)")
        if c.center or c.frame_style != "kaldi":
            raise ValueError("streaming requires kaldi framing, center=False")
        self.cfg = c
        self.blank = blank
        self.decode = decode
        if decode == "beam":
            from tpuasr.decode.prefix_beam import BeamSearchConfig
            self.beam_cfg = beam_cfg or BeamSearchConfig(
                beam_width=8, class_topk=8, blank=blank)
        elif decode != "greedy":
            raise ValueError(f"unknown decode mode {decode!r}")
        p = variables["params"]
        self.p = p
        bs = variables.get("batch_stats", {})
        self.bs = bs
        self.n_layers = len([k for k in p if k.startswith("rnn")
                             and not k.endswith("_bn")])

        # Featurizer constants.
        self._window = jnp.asarray(
            F.window_vector(c.window, c.win_length, c.periodic_window))
        cos_m, sin_m = F.rdft_matrices(c.fft_size, c.win_length)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        self._mel = jnp.asarray(F.mel_filterbank(
            c.fft_size, c.n_mels, c.sample_rate, c.fmin, c.fmax, c.htk_mel))

        self.reset()

        self._feat_chunk = jax.jit(self._featurize_frames)
        self._conv1_apply = jax.jit(self._conv1)
        self._conv2_apply = jax.jit(self._conv2)
        self._rnn_apply = jax.jit(self._rnn_head)

    # ---- state ----

    def reset(self):
        c = self.cfg
        self._samples = np.zeros((0,), np.float32)
        # Conv input buffers start with their left zero-context (5 frames).
        self._buf1 = np.zeros((5, c.n_mels), np.float32)
        self._buf2 = None          # lazily sized to conv1 output dim
        self._h = None             # per-layer GRU states
        self._prev_tok = self.blank
        self._beam_state = None
        self.tokens: list[int] = []

    # ---- pure compute pieces (jitted) ----

    def _featurize_frames(self, frames):
        """(T, win) -> (T, n_mels) log-mel (no CMVN)."""
        c = self.cfg
        w = frames * self._window
        re = w @ self._cos
        im = w @ self._sin
        power = re * re + im * im
        mel = power @ self._mel
        return jnp.log(jnp.maximum(mel, c.log_floor))

    def _bn(self, x, scope):
        sc = self.p[scope]["scale"]
        bi = self.p[scope]["bias"]
        mu = self.bs[scope]["mean"]
        var = self.bs[scope]["var"]
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi

    def _conv1(self, window):
        """window (Tw, F) covering full receptive fields -> (Tout, F', C)."""
        k = self.p["conv1"]["kernel"]                      # (11, 41, 1, C)
        x = window[None, :, :, None]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=[(0, 0), (20, 20)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = self._bn(y, "conv1_bn")
        return jax.nn.relu(y)[0]                           # (Tout, F', C)

    def _conv2(self, window):
        """window (Tw, F', C) -> (Tout, F'', C)."""
        k = self.p["conv2"]["kernel"]
        x = window[None]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 2), padding=[(0, 0), (10, 10)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = self._bn(y, "conv2_bn")
        return jax.nn.relu(y)[0]

    def _rnn_head(self, frames, hs):
        """frames (T, D) conv output (flattened), hs: tuple of (H,) states.
        Returns (logp (T, C), new_hs)."""
        x = frames
        new_hs = []
        for i in range(self.n_layers):
            x = self._bn(x, f"rnn{i}_bn")
            prm = self.p[f"rnn{i}"]
            wx, wh, b = prm["wx"], prm["wh"], prm["b"]
            H = wh.shape[0]
            xp = x @ wx + b

            def step(h, xp_t):
                hp = h @ wh
                r = jax.nn.sigmoid(xp_t[:H] + hp[:H])
                z = jax.nn.sigmoid(xp_t[H:2 * H] + hp[H:2 * H])
                n = jnp.tanh(xp_t[2 * H:] + r * hp[2 * H:])
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h_fin, ys = jax.lax.scan(step, hs[i], xp)
            new_hs.append(h_fin)
            x = ys
        x = self._bn(x, "head_bn")
        logits = x @ self.p["head"]["kernel"] + self.p["head"]["bias"]
        return jax.nn.log_softmax(logits, -1), tuple(new_hs)

    # ---- streaming driver ----

    def feed(self, samples) -> list:
        """Consume a chunk of samples; returns newly-emitted token ids."""
        c = self.cfg
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)])
        n = len(self._samples)
        T = max(0, 1 + (n - c.win_length) // c.hop_length)
        if T > 0:
            idx = (np.arange(T)[:, None] * c.hop_length
                   + np.arange(c.win_length)[None, :])
            feats = np.asarray(self._feat_chunk(
                jnp.asarray(self._samples[idx])))
            self._samples = self._samples[T * c.hop_length:]
            self._buf1 = np.concatenate([self._buf1, feats], axis=0)
        return self._advance(final=False)

    def flush(self) -> list:
        """Signal end of stream; pads tails and returns remaining tokens."""
        c = self.cfg
        # Remaining samples shorter than a window are dropped (snip-edges),
        # matching the offline featurizer.
        self._buf1 = np.concatenate(
            [self._buf1, np.zeros((5, c.n_mels), np.float32)], axis=0)
        out = self._advance(final=True)
        return out

    def _advance(self, final: bool) -> list:
        # conv1: emit out frames whose 11-frame input window is buffered.
        emitted = []
        n1 = len(self._buf1)
        n_out1 = max(0, (n1 - 11) // 2 + 1)
        if n_out1 > 0:
            y1 = np.asarray(self._conv1_apply(jnp.asarray(self._buf1)))
            y1 = y1[:n_out1]
            self._buf1 = self._buf1[n_out1 * 2:]
            if self._buf2 is None:
                self._buf2 = np.zeros((5,) + y1.shape[1:], np.float32)
            self._buf2 = np.concatenate([self._buf2, y1], axis=0)
        if final and self._buf2 is not None:
            self._buf2 = np.concatenate(
                [self._buf2, np.zeros((5,) + self._buf2.shape[1:],
                                      np.float32)], axis=0)
        if self._buf2 is None:
            return []
        n2 = len(self._buf2)
        n_out2 = max(0, n2 - 11 + 1)
        if n_out2 <= 0:
            return []
        y2 = np.asarray(self._conv2_apply(jnp.asarray(self._buf2)))
        y2 = y2[:n_out2]
        self._buf2 = self._buf2[n_out2:]
        frames = y2.reshape(n_out2, -1)
        if self._h is None:
            hs = []
            for i in range(self.n_layers):
                H = self.p[f"rnn{i}"]["wh"].shape[0]
                hs.append(jnp.zeros((H,), jnp.float32))
            self._h = tuple(hs)
        logp, self._h = self._rnn_apply(jnp.asarray(frames), self._h)
        if self.decode == "beam":
            from tpuasr.decode.prefix_beam import (beam_init_state,
                                                   ctc_beam_search)
            if self._beam_state is None:
                self._beam_state = beam_init_state(1, self.beam_cfg)
            Tc = logp.shape[0]
            out = ctc_beam_search(
                logp[None], jnp.asarray([Tc], jnp.int32), self.beam_cfg,
                init_state=self._beam_state, return_state=True)
            self._beam_state = out["state"]
            n = int(out["token_lens"][0, 0])
            self.tokens = np.asarray(out["tokens"])[0, 0, :n].tolist()
            return list(self.tokens)
        ids = np.asarray(jnp.argmax(logp, -1))
        for t in ids:
            t = int(t)
            if t != self.blank and t != self._prev_tok:
                emitted.append(t)
            self._prev_tok = t
        self.tokens.extend(emitted)
        return emitted
