#!/usr/bin/env python
"""BASELINE config #1: single-utterance wav -> log-mel-fbank/MFCC featurizer,
CPU parity vs reference frames.

Without a readable reference tree (SURVEY.md provenance), "reference frames"
are produced by the torch-CPU oracle pipeline (torch.stft + shared mel/DCT
matrices) — the same oracle the unit tests pin conventions against. Reports
the max abs deviation of fbank frames and MFCC frames, plus single-utterance
featurizer latency on the default backend.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def main():
    import jax

    from tpuasr.features import (FeatureConfig, Featurizer, dct_matrix,
                                 mel_filterbank, window_vector)
    from tpuasr.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    wav = synth_wav(rng, 1, 10.0)
    max_dev = {}
    for ftype in ("fbank", "mfcc"):
        cfg = FeatureConfig(feature_type=ftype, frame_style="torch",
                            cmn=False, cvn=False)
        fz = Featurizer(cfg)
        ours = np.asarray(fz(wav)[0])

        import scipy.fft
        import torch
        window = window_vector(cfg.window, cfg.win_length,
                               cfg.periodic_window)
        spec = torch.stft(torch.from_numpy(wav), n_fft=cfg.fft_size,
                          hop_length=cfg.hop_length,
                          win_length=cfg.win_length,
                          window=torch.from_numpy(window), center=False,
                          onesided=True, return_complex=True)
        power = (spec.abs() ** 2).numpy().transpose(0, 2, 1)
        mel = power @ mel_filterbank(cfg.fft_size, cfg.n_mels,
                                     cfg.sample_rate, cfg.fmin, cfg.fmax)
        ref = np.log(np.maximum(mel, cfg.log_floor))
        if ftype == "mfcc":
            ref = scipy.fft.dct(ref, type=2, norm="ortho",
                                axis=-1)[..., :cfg.n_mfcc]
        dev = float(np.abs(ours - ref).max())
        max_dev[ftype] = dev
        detail(f"{ftype}: shape {ours.shape} max|dev| {dev:.3e}")

    fz = Featurizer(FeatureConfig())
    lens = np.full((1,), wav.shape[1], np.int32)
    t = time_fn(fz, wav, lens)
    emit(1, "feat_parity_max_abs_dev", max(max_dev.values()), "log_units",
         fbank_dev=max_dev["fbank"], mfcc_dev=max_dev["mfcc"],
         single_utt_latency_ms=round(t * 1e3, 3),
         backend=jax.default_backend())


if __name__ == "__main__":
    main()
