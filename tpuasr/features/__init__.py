"""Featurizers: wav -> STFT -> log-mel fbank / MFCC -> CMVN.

Replaces the reference's in-dataset featurizer (reference: asr/utils/dataset.py,
per SURVEY.md section 2.1 — torch/scipy STFT chain run per-utterance in dataloader
worker processes). Here the featurizer is a batched, fixed-shape, jit-compiled
device function: the whole padded batch of waveforms is featurized on-device in
one fused XLA program (or a single Pallas kernel chain on TPU).
"""

from tpuasr.features.functional import (
    dct_matrix,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
    next_pow2,
    rdft_matrices,
    window_vector,
)
from tpuasr.features.reference import FeatureConfig, Featurizer, num_frames

__all__ = [
    "FeatureConfig",
    "Featurizer",
    "num_frames",
    "dct_matrix",
    "hz_to_mel",
    "mel_filterbank",
    "mel_to_hz",
    "next_pow2",
    "rdft_matrices",
    "window_vector",
]
