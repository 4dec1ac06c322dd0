"""Fused Pallas featurizer parity vs the jnp reference featurizer."""

import jax
import numpy as np
import pytest

from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.features.pallas_fused import FusedFeaturizer

needs_interpret = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode():
    if needs_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("feature_type", ["fbank", "mfcc", "spectrogram"])
def test_fused_matches_reference(rng, feature_type):
    cfg = FeatureConfig(feature_type=feature_type, cmn=False, cvn=False)
    ref = Featurizer(cfg)
    fused = FusedFeaturizer(cfg)
    B, S = 2, 16000
    wav = (rng.standard_normal((B, S)) * 0.2).astype(np.float32)
    lens = np.array([S, S - 4000], np.int32)
    f_ref, l_ref = ref(wav, lens)
    f_fus, l_fus = fused(wav, lens)
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_fus))
    f_ref, f_fus = np.asarray(f_ref), np.asarray(f_fus)
    assert f_ref.shape == f_fus.shape
    np.testing.assert_allclose(f_fus, f_ref, rtol=1e-3, atol=1e-3)


def test_fused_cmvn_and_preemph(rng):
    cfg = FeatureConfig(cmn=True, cvn=True, preemphasis=0.97)
    ref = Featurizer(cfg)
    fused = FusedFeaturizer(cfg)
    wav = (np.sin(2 * np.pi * 500 * np.arange(12000) / 8000)
           + 0.05 * rng.standard_normal(12000)).astype(np.float32)
    f_ref, _ = ref(wav)
    f_fus, _ = fused(wav)
    np.testing.assert_allclose(np.asarray(f_fus), np.asarray(f_ref),
                               rtol=1e-3, atol=2e-3)


def test_fused_rejects_torch_framing():
    with pytest.raises(ValueError):
        FusedFeaturizer(FeatureConfig(frame_style="torch"))
    with pytest.raises(ValueError):
        FusedFeaturizer(FeatureConfig(center=True))
