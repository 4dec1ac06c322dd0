"""Fused Pallas featurizer kernel chain (BASELINE north star: "the
wav->STFT->mel-filterbank/MFCC->CMVN featurizer fuses into a single Pallas
kernel chain").

One kernel performs, per (utterance, time-block) grid step:

  frames block --pipeline DMA--> VMEM
      -> window (VPU) -> rDFT as two (T_BLK, win)@(win, F) matmuls (MXU)
      -> power (VPU)  -> mel (T_BLK, F)@(F, M) matmul (MXU)

so the spectral intermediates (re/im/power, (B, T, n_freqs) each) never
round-trip through HBM between the two matmuls. Framing happens INSIDE the
kernel too (round-3 rewrite): the wav is reshaped (free) to hop-sized rows
(B, T, hop), the kernel fetches the current and next time blocks of rows,
and each overlapping window is assembled from STATIC sublane shifts + a
lane concat — no dynamic VMEM indexing (which Mosaic correctly refuses at
non-128-multiple lane offsets), and no XLA hop-strided gather materializing
a (B, T, win_pad) framed tensor in HBM (the round-1/2 formulation: that
gather plus its 131 MB round trip was ~2/3 of the featurizer's runtime at
B=128). Configs whose hop exceeds 128 lanes fall back to the old
gather-outside path (the else branch of `_kernel_logmel`, feeding
`_fused_kernel`). All matmul dims are padded
to 128 lanes with zeros (zero rows/cols contribute nothing). CMVN stays
outside (a masked reduction XLA fuses into the consumer).

Parity: must match features/reference.py (same constant matrices) — see
tests/test_features_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.features import functional as F
from tpuasr.features.reference import FeatureConfig, num_frames

T_BLK = 256


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fused_kernel(frames_ref, window_ref, cos_ref, sin_ref, mel_ref,
                  out_ref):
    # precision=HIGHEST: the MXU's default f32 mode is bf16 passes, which
    # moves low-energy log-mel values by ~0.3-0.6 after the log (the
    # parity-critical path must be exact on hardware; see
    # features/reference.py).
    hi = jax.lax.Precision.HIGHEST
    w = frames_ref[0] * window_ref[:]                  # (T_BLK, win_pad)
    re = jnp.dot(w, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(w, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    power = re * re + im * im                          # (T_BLK, F_pad)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[0] = mel                                   # (T_BLK, out_dim)


def _make_framed_kernel(hop: int, win: int, win_pad: int):
    """Kernel variant that assembles the overlapping analysis windows from
    hop-sized rows in VMEM. Frame i of the block needs samples
    [i*hop, i*hop + win): with rows r[i] = wav[i*hop:(i+1)*hop], that is
    rows i..i+n_full (n_full = ceil(win/hop) - 1 full rows + a remainder),
    i.e. a lane concat of sublane-SHIFTED copies of the row tile — all
    shifts static, the cross-block tail coming from the next block's rows.
    """
    n_full = win // hop
    rem = win - n_full * hop

    def kernel(rcur_ref, rnext_ref, window_ref, cos_ref, sin_ref, mel_ref,
               out_ref):
        hi = jax.lax.Precision.HIGHEST
        r0 = rcur_ref[0]                               # (T_BLK, hop)
        rn = rnext_ref[0]
        parts = []
        for s in range(n_full + (1 if rem else 0)):
            part = r0 if s == 0 else jnp.concatenate([r0[s:], rn[:s]],
                                                     axis=0)
            parts.append(part if s < n_full else part[:, :rem])
        if win_pad > win:
            parts.append(jnp.zeros((r0.shape[0], win_pad - win),
                                   jnp.float32))
        frames = jnp.concatenate(parts, axis=1)        # (T_BLK, win_pad)
        w = frames * window_ref[:]
        re = jnp.dot(w, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=hi)
        im = jnp.dot(w, sin_ref[:], preferred_element_type=jnp.float32,
                     precision=hi)
        power = re * re + im * im
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                      precision=hi)
        out_ref[0] = mel

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call_framed(B: int, hop: int, win: int, win_pad: int, f_pad: int,
                       out_dim: int, n_tb: int, interpret: bool = False):
    return pl.pallas_call(
        _make_framed_kernel(hop, win, win_pad),
        grid=(B, n_tb),
        in_specs=[
            pl.BlockSpec((1, T_BLK, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),           # rows, block t
            pl.BlockSpec((1, T_BLK, hop), lambda b, t: (b, t + 1, 0),
                         memory_space=pltpu.VMEM),           # rows, t + 1
            pl.BlockSpec((1, win_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # window
            pl.BlockSpec((win_pad, f_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # cos
            pl.BlockSpec((win_pad, f_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # sin
            pl.BlockSpec((f_pad, out_dim), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # mel
        ],
        out_specs=pl.BlockSpec((1, T_BLK, out_dim), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tb * T_BLK, out_dim),
                                       jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _build_call(B: int, win_pad: int, f_pad: int, out_dim: int, n_tb: int,
                interpret: bool = False):
    return pl.pallas_call(
        _fused_kernel,
        grid=(B, n_tb),
        in_specs=[
            pl.BlockSpec((1, T_BLK, win_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),           # frames
            pl.BlockSpec((1, win_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # window
            pl.BlockSpec((win_pad, f_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # cos
            pl.BlockSpec((win_pad, f_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # sin
            pl.BlockSpec((f_pad, out_dim), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),           # mel
        ],
        out_specs=pl.BlockSpec((1, T_BLK, out_dim), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tb * T_BLK, out_dim),
                                       jnp.float32),
        interpret=interpret,
    )


class FusedFeaturizer:
    """Drop-in for features.reference.Featurizer, Pallas mel/power path.

    Supports frame_style='kaldi', center=False (the TPU-native default path);
    fbank and spectrogram feature types fuse fully; MFCC folds the DCT into
    the mel matrix only when lifter == 0 (log is nonlinear, so MFCC applies
    the DCT outside on the kernel's log-mel output).
    """

    def __init__(self, cfg: FeatureConfig):
        if cfg.center or cfg.frame_style != "kaldi":
            raise ValueError("FusedFeaturizer supports the kaldi framing "
                             "path (center=False); use Featurizer otherwise")
        self.cfg = cfg
        c = cfg
        self._win_pad = _round_up(c.win_length, 128)
        self._f_pad = _round_up(c.n_freqs, 128)
        window = F.window_vector(c.window, c.win_length, c.periodic_window)
        self._window = jnp.asarray(
            np.pad(window, (0, self._win_pad - c.win_length)))[None, :]
        cos_m, sin_m = F.rdft_matrices(c.fft_size, c.win_length)
        pad_wf = ((0, self._win_pad - c.win_length),
                  (0, self._f_pad - c.n_freqs))
        self._cos = jnp.asarray(np.pad(cos_m, pad_wf))
        self._sin = jnp.asarray(np.pad(sin_m, pad_wf))
        if c.feature_type in ("fbank", "mfcc"):
            proj = F.mel_filterbank(c.fft_size, c.n_mels, c.sample_rate,
                                    c.fmin, c.fmax, c.htk_mel)
        else:
            proj = np.eye(c.n_freqs, dtype=np.float32)
        # Pad projection to lane-aligned dims (extra freq rows are zero).
        self._proj_dim = proj.shape[1]
        self._proj_pad = _round_up(self._proj_dim, 128)
        proj = np.pad(proj, ((0, self._f_pad - proj.shape[0]),
                             (0, self._proj_pad - proj.shape[1])))
        self._proj = jnp.asarray(proj)
        if c.feature_type == "mfcc":
            self._dct = jnp.asarray(F.dct_matrix(c.n_mfcc, c.n_mels))
            self._lifter = (jnp.asarray(F.lifter_vector(c.n_mfcc, c.lifter))
                            if c.lifter > 0 else None)
        else:
            self._dct = None
            self._lifter = None
        self._jit = jax.jit(self._featurize)

    @property
    def tables(self):
        """Device-array operands as a pytree. IMPORTANT (axon/TPU): pass
        these through jit as ARGUMENTS, never close over them — a jit
        program with multi-MB embedded constants permanently degrades this
        process's dispatch path (~2 ms/call on every later executable;
        measured: the fused featurizer went 3.8 ms -> 0.03 ms and stopped
        poisoning downstream dispatches when its tables became args)."""
        t = {"window": self._window, "cos": self._cos, "sin": self._sin,
             "proj": self._proj}
        if self._dct is not None:
            t["dct"] = self._dct
        if self._lifter is not None:
            t["lifter"] = self._lifter
        return t

    def _kernel_logmel(self, wav, tabs):
        """(B, S) -> (B, T, proj_dim) log(mel power) via the fused kernel."""
        c = self.cfg
        B, S = wav.shape
        T = num_frames(c, S)
        n_tb = max(1, -(-T // T_BLK))
        T_pad = n_tb * T_BLK
        interp = jax.default_backend() != "tpu"
        # Framed path needs hop to fit a lane tile and the window to span
        # at most the next block of rows (shifts stay within two blocks).
        if c.hop_length <= 128 and c.win_length // c.hop_length <= T_BLK:
            # In-kernel framing from hop-sized rows (see module docstring):
            # one extra zero block of rows so the t+1 BlockSpec stays in
            # range AND supplies the final frames' tail zeros.
            need = (T_pad + T_BLK) * c.hop_length
            wav_p = jnp.pad(wav, ((0, 0), (0, max(0, need - S))))
            rows = wav_p[:, :need].reshape(B, T_pad + T_BLK, c.hop_length)
            call = _build_call_framed(B, c.hop_length, c.win_length,
                                      self._win_pad, self._f_pad,
                                      self._proj_pad, n_tb, interp)
            mel = call(rows, rows, tabs["window"], tabs["cos"], tabs["sin"],
                       tabs["proj"])
        else:
            # Fallback (hop wider than a lane tile): hop-strided framing
            # gather by XLA outside, aligned work in the kernel.
            need = (T_pad - 1) * c.hop_length + c.win_length
            wav_p = jnp.pad(wav, ((0, 0), (0, max(0, need - S))))
            idx = (np.arange(T_pad)[:, None] * c.hop_length
                   + np.arange(c.win_length)[None, :])
            frames = wav_p[:, idx]                            # (B, T_pad, win)
            frames = jnp.pad(
                frames, ((0, 0), (0, 0), (0, self._win_pad - c.win_length)))
            call = _build_call(B, self._win_pad, self._f_pad,
                               self._proj_pad, n_tb, interp)
            mel = call(frames, tabs["window"], tabs["cos"], tabs["sin"],
                       tabs["proj"])
        mel = mel[:, :T, :self._proj_dim]
        return jnp.log(jnp.maximum(mel, c.log_floor))

    def _featurize(self, wav, lengths, dither_key=None, tables=None):
        c = self.cfg
        # tables=None falls back to the attributes — fine OUTSIDE jit (the
        # public __call__/_jit path threads them); inside a caller's jit
        # always pass `tables` (see .tables docstring).
        tabs = tables if tables is not None else self.tables
        if c.dither > 0.0 and dither_key is not None:
            wav = wav + c.dither * jax.random.normal(dither_key, wav.shape)
        if c.preemphasis > 0:
            prev = jnp.concatenate([wav[:, :1], wav[:, :-1]], axis=1)
            wav = wav - c.preemphasis * prev
        feat = self._kernel_logmel(wav, tabs)
        if c.feature_type == "mfcc":
            feat = jnp.einsum("btm,mc->btc", feat, tabs["dct"],
                              preferred_element_type=jnp.float32)
            if "lifter" in tabs:
                feat = feat * tabs["lifter"]
        T = feat.shape[1]
        flen = jnp.minimum(num_frames(c, lengths).astype(jnp.int32), T)
        mask = (jnp.arange(T)[None, :] < flen[:, None]).astype(feat.dtype)
        # CMVN (masked) — outside the kernel; XLA fuses it.
        if c.cmn or c.cvn:
            m = mask[:, :, None]
            denom = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mean = jnp.sum(feat * m, axis=1, keepdims=True) / denom
            if c.cmn:
                feat = feat - mean
                if c.cvn:
                    var = (jnp.sum((feat * m) ** 2, axis=1, keepdims=True)
                           / denom)
                    feat = feat * jax.lax.rsqrt(var + 1e-8)
            elif c.cvn:
                var = (jnp.sum((feat - mean) ** 2 * m, axis=1, keepdims=True)
                       / denom)
                feat = feat * jax.lax.rsqrt(var + 1e-8)
        feat = feat * mask[:, :, None]
        return feat, flen

    def __call__(self, wav, lengths=None):
        wav = jnp.asarray(wav, dtype=jnp.float32)
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        if lengths is None:
            lengths = jnp.full((wav.shape[0],), wav.shape[1], jnp.int32)
        else:
            lengths = jnp.asarray(lengths, jnp.int32)
        feat, flen = self._jit(wav, lengths, tables=self.tables)
        if squeeze:
            return feat[0], flen[0]
        return feat, flen
