"""Pure-jnp batched featurizer: wav -> STFT -> log-mel fbank / MFCC -> CMVN.

This is the numerically-pinned reference implementation (parity oracle:
torch.stft on CPU; see tests/test_features.py).  It is already TPU-friendly —
fixed shapes, gather-based framing, rDFT as matmul, mel/DCT as matmul — and is
what the fused Pallas kernel chain (features/pallas_fused.py) must match.

Reference behavior replaced (SURVEY.md sections 2.1/3.3): the reference ran this
chain per-utterance on CPU inside dataloader worker processes
(asr/utils/dataset.py [M]); here the whole padded batch runs on-device in one
jitted program.

Conventions (all explicit in FeatureConfig so parity can be re-pinned against
the real reference when it becomes readable):
  * snip-edges framing by default (``center=False``): frame t covers samples
    [t*hop, t*hop + win); num_frames = 1 + (n - win)//hop.
  * optional ``center=True``: reflect-pad by n_fft//2 like torch.stft.
  * whole-waveform pre-emphasis (y[t] = x[t] - coeff*x[t-1]) when
    ``preemphasis > 0``.
  * power spectrum (|X|^2); ``log(max(power_mel, floor))`` natural log.
  * per-utterance CMVN over valid frames only (masked).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.features import functional as F


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Static featurizer configuration (hashable; closed over by jit)."""

    sample_rate: int = 8000          # ASpIRE-style 8 kHz audio [B]
    win_ms: float = 25.0
    hop_ms: float = 10.0
    n_fft: int | None = None         # default: next_pow2(win_length)
    window: str = "hamming"
    periodic_window: bool = True
    center: bool = False             # snip-edges (Kaldi-style) by default
    dither: float = 0.0              # train-time additive noise scale
    # Framing convention: "kaldi" = frame t covers [t*hop, t*hop+win);
    # "torch" = frame t covers [t*hop, t*hop+n_fft) with the win_length
    # window centered inside the n_fft span (torch.stft semantics).
    frame_style: str = "kaldi"
    preemphasis: float = 0.0
    feature_type: str = "fbank"      # "fbank" | "mfcc" | "spectrogram"
    n_mels: int = 64
    fmin: float = 20.0
    fmax: float | None = None
    htk_mel: bool = True
    n_mfcc: int = 13
    lifter: float = 0.0
    log_floor: float = 1e-10
    cmn: bool = True                 # per-utterance mean normalization
    cvn: bool = True                 # per-utterance variance normalization
    splice_left: int = 0             # frame splicing context (frame-wise models)
    splice_right: int = 0

    @cached_property
    def win_length(self) -> int:
        return int(round(self.sample_rate * self.win_ms / 1000.0))

    @cached_property
    def hop_length(self) -> int:
        return int(round(self.sample_rate * self.hop_ms / 1000.0))

    @cached_property
    def fft_size(self) -> int:
        return self.n_fft if self.n_fft is not None else F.next_pow2(self.win_length)

    @property
    def n_freqs(self) -> int:
        return self.fft_size // 2 + 1

    @property
    def base_dim(self) -> int:
        if self.feature_type == "fbank":
            return self.n_mels
        if self.feature_type == "mfcc":
            return self.n_mfcc
        if self.feature_type == "spectrogram":
            return self.n_freqs
        raise ValueError(f"unknown feature_type {self.feature_type!r}")

    @property
    def feat_dim(self) -> int:
        return self.base_dim * (1 + self.splice_left + self.splice_right)


def _frame_span(cfg: FeatureConfig) -> int:
    """Samples consumed per frame under the configured framing convention."""
    return cfg.fft_size if cfg.frame_style == "torch" else cfg.win_length


def num_frames(cfg: FeatureConfig, n_samples) -> jnp.ndarray | int:
    """Number of frames produced for a signal of length n_samples.

    Works for both python ints (static shapes) and jnp arrays (lengths).
    """
    span = _frame_span(cfg)
    if cfg.center:
        n_samples = n_samples + 2 * (cfg.fft_size // 2)
    if isinstance(n_samples, (int, np.integer)):
        return max(0, 1 + (n_samples - span) // cfg.hop_length)
    return jnp.maximum(0, 1 + (n_samples - span) // cfg.hop_length)


class Featurizer:
    """Batched jit-compiled featurizer.

    __call__(wav (B, S) float32, lengths (B,) int32)
        -> feats (B, T, F) float32, frame_lengths (B,) int32
    T is static (determined by S), invalid frames are zeroed.
    """

    def __init__(self, cfg: FeatureConfig):
        self.cfg = cfg
        c = cfg
        self._window = jnp.asarray(
            F.window_vector(c.window, c.win_length, c.periodic_window))
        cos_m, sin_m = F.rdft_matrices(c.fft_size, c.win_length)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        if c.feature_type in ("fbank", "mfcc"):
            self._mel = jnp.asarray(F.mel_filterbank(
                c.fft_size, c.n_mels, c.sample_rate, c.fmin, c.fmax, c.htk_mel))
        if c.feature_type == "mfcc":
            self._dct = jnp.asarray(F.dct_matrix(c.n_mfcc, c.n_mels))
            self._lifter = (jnp.asarray(F.lifter_vector(c.n_mfcc, c.lifter))
                            if c.lifter > 0 else None)
        self._jit = jax.jit(self._featurize)

    # ---- pipeline stages (each pure, fixed-shape) ----

    def _preemphasize(self, wav):
        c = self.cfg.preemphasis
        if c <= 0.0:
            return wav
        prev = jnp.concatenate([wav[:, :1], wav[:, :-1]], axis=1)
        return wav - c * prev

    def _frame(self, wav):
        """(B, S) -> (B, T, win) via gather with static T."""
        c = self.cfg
        if c.center:
            pad = c.fft_size // 2
            wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        T = num_frames(dataclasses.replace(c, center=False), wav.shape[1])
        if T <= 0:
            raise ValueError(
                f"signal too short: {wav.shape[1]} samples < frame span "
                f"{_frame_span(c)}")
        # Only the win_length windowed samples contribute to the rDFT; under
        # torch framing the window sits centered in the n_fft span, which for
        # the power spectrum is a pure phase shift but changes WHICH samples
        # each frame covers — so the gather offset matters.
        off = (c.fft_size - c.win_length) // 2 if c.frame_style == "torch" else 0
        idx = (np.arange(T)[:, None] * c.hop_length + off
               + np.arange(c.win_length)[None, :])
        return wav[:, idx]

    def _power_spectrum(self, frames):
        """(B, T, win) -> (B, T, n_freqs) |rfft|^2 via two matmuls (MXU)."""
        w = frames * self._window
        # precision=HIGHEST: at the TPU default the MXU runs these f32
        # matmuls as bf16 passes, which moves log-mel values by ~0.5 —
        # the parity-critical path (BASELINE config 1) must be exact on
        # every backend. Cost is negligible (featurizer is ~3 ms of a
        # ~45 ms pipeline; the fused Pallas kernel is exact by layout).
        re = jnp.einsum("btw,wf->btf", w, self._cos,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        im = jnp.einsum("btw,wf->btf", w, self._sin,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        return re * re + im * im

    def _to_features(self, power):
        c = self.cfg
        if c.feature_type == "spectrogram":
            return jnp.log(jnp.maximum(power, c.log_floor))
        mel = jnp.einsum("btf,fm->btm", power, self._mel,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        logmel = jnp.log(jnp.maximum(mel, c.log_floor))
        if c.feature_type == "fbank":
            return logmel
        mfcc = jnp.einsum("btm,mc->btc", logmel, self._dct,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        if self._lifter is not None:
            mfcc = mfcc * self._lifter
        return mfcc

    def _cmvn(self, feat, mask):
        """Masked per-utterance mean/variance normalization.

        mask: (B, T) 1.0 on valid frames.
        """
        c = self.cfg
        if not (c.cmn or c.cvn):
            return feat
        m = mask[:, :, None]
        denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(feat * m, axis=1, keepdims=True) / denom
        if c.cmn:
            feat = feat - mean
            if c.cvn:
                var = jnp.sum((feat * m) ** 2, axis=1, keepdims=True) / denom
                feat = feat * jax.lax.rsqrt(var + 1e-8)
        elif c.cvn:
            var = (jnp.sum((feat - mean) ** 2 * m, axis=1, keepdims=True)
                   / denom)
            feat = feat * jax.lax.rsqrt(var + 1e-8)
        return feat

    def _splice(self, feat):
        """Concatenate +-context frames (edge-replicated), (B,T,F)->(B,T,F*k)."""
        c = self.cfg
        if c.splice_left == 0 and c.splice_right == 0:
            return feat
        parts = []
        T = feat.shape[1]
        for off in range(-c.splice_left, c.splice_right + 1):
            idx = np.clip(np.arange(T) + off, 0, T - 1)
            parts.append(feat[:, idx, :])
        return jnp.concatenate(parts, axis=-1)

    def _featurize(self, wav, lengths, dither_key=None, tables=None):
        # `tables` is accepted (and ignored) for interface parity with
        # FusedFeaturizer: this path's constants are a few KB (window, mel
        # filterbank), far below the axon constant-capture threshold.
        c = self.cfg
        if c.dither > 0.0 and dither_key is not None:
            wav = wav + c.dither * jax.random.normal(dither_key, wav.shape)
        wav = self._preemphasize(wav)
        frames = self._frame(wav)
        power = self._power_spectrum(frames)
        feat = self._to_features(power)
        T = feat.shape[1]
        flen = jnp.minimum(num_frames(c, lengths).astype(jnp.int32), T)
        mask = (jnp.arange(T)[None, :] < flen[:, None]).astype(feat.dtype)
        feat = self._cmvn(feat, mask)
        feat = self._splice(feat)
        feat = feat * mask[:, :, None]
        return feat, flen

    def __call__(self, wav, lengths=None):
        wav = jnp.asarray(wav, dtype=jnp.float32)
        if wav.ndim == 1:
            wav = wav[None]
            squeeze = True
        else:
            squeeze = False
        if lengths is None:
            lengths = jnp.full((wav.shape[0],), wav.shape[1], dtype=jnp.int32)
        else:
            lengths = jnp.asarray(lengths, dtype=jnp.int32)
        feat, flen = self._jit(wav, lengths)
        if squeeze:
            return feat[0], flen[0]
        return feat, flen
