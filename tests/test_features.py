"""Featurizer parity tests (BASELINE config #1).

torch-CPU is the numeric oracle for STFT conventions (SURVEY.md section 4.2):
window vectors match torch.*_window, the power spectrum matches
|torch.stft|^2 for center=False and center=True, the DCT matrix matches
scipy, and the full fbank/MFCC chain matches a torch-built pipeline using the
same mel matrix.
"""

import numpy as np
import pytest
import scipy.fft
import torch

from tpuasr.features import (FeatureConfig, Featurizer, dct_matrix,
                             mel_filterbank, num_frames, rdft_matrices,
                             window_vector)


def _torch_power_spec(wav, cfg, window, center):
    x = torch.from_numpy(np.asarray(wav, dtype=np.float32))
    spec = torch.stft(
        x,
        n_fft=cfg.fft_size,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.from_numpy(window),
        center=center,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    )
    return (spec.abs() ** 2).numpy().transpose(0, 2, 1)  # (B, T, n_freqs)


@pytest.mark.parametrize("name,periodic", [
    ("hann", True), ("hann", False), ("hamming", True), ("hamming", False),
    ("blackman", True),
])
def test_window_matches_torch(name, periodic):
    n = 200
    ours = window_vector(name, n, periodic)
    fn = {"hann": torch.hann_window, "hamming": torch.hamming_window,
          "blackman": torch.blackman_window}[name]
    theirs = fn(n, periodic=periodic, dtype=torch.float64).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_rdft_matches_numpy_rfft(rng):
    n_fft, win = 256, 200
    cos_m, sin_m = rdft_matrices(n_fft, win, dtype=np.float64)
    x = rng.standard_normal(win)
    ref = np.fft.rfft(x, n=n_fft)
    np.testing.assert_allclose(x @ cos_m, ref.real, atol=1e-9)
    np.testing.assert_allclose((x @ cos_m) ** 2 + (x @ sin_m) ** 2,
                               np.abs(ref) ** 2, atol=1e-9)


@pytest.mark.parametrize("center", [False, True])
def test_power_spectrum_matches_torch_stft(rng, center):
    cfg = FeatureConfig(feature_type="spectrogram", center=center,
                        frame_style="torch", cmn=False, cvn=False)
    fz = Featurizer(cfg)
    B, S = 3, 8000
    wav = rng.standard_normal((B, S)).astype(np.float32)
    window = window_vector(cfg.window, cfg.win_length, cfg.periodic_window)

    frames = fz._frame(np.asarray(wav))
    power = np.asarray(fz._power_spectrum(frames))
    ref = _torch_power_spec(wav, cfg, window, center)
    assert power.shape == ref.shape
    np.testing.assert_allclose(power, ref, rtol=1e-4, atol=1e-4)


def test_num_frames_matches_torch_stft_framecount():
    cfg = FeatureConfig(frame_style="torch")
    for S in [256, 300, 999, 8000, 12345]:
        window = window_vector(cfg.window, cfg.win_length, cfg.periodic_window)
        ref = _torch_power_spec(np.zeros((1, S), np.float32), cfg, window,
                                center=False)
        assert num_frames(cfg, S) == ref.shape[1]


def test_dct_matrix_matches_scipy(rng):
    n_mels, n_mfcc = 40, 13
    d = dct_matrix(n_mfcc, n_mels, dtype=np.float64)
    x = rng.standard_normal((5, n_mels))
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, :n_mfcc]
    np.testing.assert_allclose(x @ d, ref, atol=1e-10)


def test_mel_filterbank_properties():
    fb = mel_filterbank(256, 40, 8000.0, fmin=20.0)
    assert fb.shape == (129, 40)
    assert np.all(fb >= 0)
    # Every filter has some mass; peaks move to strictly higher bins.
    peaks = fb.argmax(axis=0)
    assert np.all(fb.max(axis=0) > 0)
    assert np.all(np.diff(peaks) >= 1)
    # Interior FFT bins are covered by at least one filter.
    covered = fb.sum(axis=1)
    lo = int(np.ceil(20.0 / (8000.0 / 256)))
    assert np.all(covered[lo + 2:-2] > 0)


@pytest.mark.parametrize("feature_type", ["fbank", "mfcc"])
def test_full_chain_matches_torch_pipeline(rng, feature_type):
    """wav -> power (torch.stft) -> mel -> log [-> DCT] vs our jnp chain."""
    cfg = FeatureConfig(feature_type=feature_type, frame_style="torch",
                        cmn=False, cvn=False)
    fz = Featurizer(cfg)
    B, S = 2, 16000
    wav = rng.standard_normal((B, S)).astype(np.float32) * 0.1
    feat, flen = fz(wav)
    feat = np.asarray(feat)

    window = window_vector(cfg.window, cfg.win_length, cfg.periodic_window)
    power = _torch_power_spec(wav, cfg, window, center=False)
    mel = power @ mel_filterbank(cfg.fft_size, cfg.n_mels, cfg.sample_rate,
                                 cfg.fmin, cfg.fmax, cfg.htk_mel)
    ref = np.log(np.maximum(mel, cfg.log_floor))
    if feature_type == "mfcc":
        ref = scipy.fft.dct(ref, type=2, norm="ortho", axis=-1)[..., :cfg.n_mfcc]
    assert feat.shape == ref.shape
    np.testing.assert_allclose(feat, ref, rtol=1e-3, atol=1e-3)
    assert int(flen[0]) == ref.shape[1]


def test_preemphasis():
    cfg = FeatureConfig(preemphasis=0.97, feature_type="spectrogram",
                        cmn=False, cvn=False)
    fz = Featurizer(cfg)
    wav = np.arange(1, 6, dtype=np.float32)[None]
    out = np.asarray(fz._preemphasize(wav))
    expect = np.array([[1 - 0.97 * 1, 2 - 0.97 * 1, 3 - 0.97 * 2,
                        4 - 0.97 * 3, 5 - 0.97 * 4]], np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_cmvn_masked(rng):
    cfg = FeatureConfig(cmn=True, cvn=True)
    fz = Featurizer(cfg)
    S_long, S_short = 8000, 4800
    wav_short = rng.standard_normal(S_short).astype(np.float32)
    # Same audio, padded into a longer buffer: valid frames must match.
    pad = np.concatenate([wav_short, np.zeros(S_long - S_short, np.float32)])
    batch = np.stack([pad, rng.standard_normal(S_long).astype(np.float32)])
    lengths = np.array([S_short, S_long], np.int32)
    feat, flen = fz(batch, lengths)
    feat = np.asarray(feat)

    solo_feat, solo_len = fz(wav_short[None],
                             np.array([S_short], np.int32))
    n = int(flen[0])
    assert n == int(solo_len[0])
    np.testing.assert_allclose(feat[0, :n], np.asarray(solo_feat)[0, :n],
                               rtol=1e-4, atol=1e-4)
    # Invalid frames are zeroed; valid frames are ~zero-mean unit-var.
    np.testing.assert_allclose(feat[0, n:], 0.0, atol=1e-6)
    valid = feat[0, :n]
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-2)


def test_splice():
    cfg = FeatureConfig(splice_left=2, splice_right=2, cmn=False, cvn=False)
    fz = Featurizer(cfg)
    wav = np.random.default_rng(1).standard_normal((1, 8000)).astype(np.float32)
    feat, _ = fz(wav)
    assert feat.shape[-1] == cfg.n_mels * 5
    base = Featurizer(FeatureConfig(cmn=False, cvn=False))(wav)[0]
    base = np.asarray(base)
    feat = np.asarray(feat)
    # Center block equals the unspliced features.
    np.testing.assert_allclose(feat[:, :, 2 * cfg.n_mels:3 * cfg.n_mels],
                               base, rtol=1e-5)
    # Left context at t=5 equals frame t=3.
    np.testing.assert_allclose(feat[:, 5, :cfg.n_mels], base[:, 3], rtol=1e-5)
