"""tpuasr — a TPU-native speech recognition framework in JAX.

A ground-up rebuild of the capabilities of the reference framework
``jinserk/pytorch-asr`` (hybrid ASR: featurizer -> acoustic model -> CTC ->
greedy/beam decode), designed TPU-first:

* the wav -> STFT -> log-mel-fbank/MFCC -> CMVN featurizer is pure-jnp
  (``tpuasr.features.reference``) with a fused Pallas kernel chain
  (``tpuasr.features.pallas_fused``) for the hot path;
* acoustic models (ResNet-CTC, DeepSpeech-style conv+BiRNN, CapsNet with
  dynamic routing) are jitted Flax modules (``tpuasr.models``);
* CTC loss is a log-space forward-backward with an analytic custom-VJP
  (``tpuasr.losses``) and a Pallas kernel on TPU, replacing the reference's
  warp-ctc C++/CUDA extension;
* decoding is an on-device, batched, XLA-compilable CTC prefix beam search
  (``tpuasr.decode``), replacing the reference's Kaldi latgen C++ binding;
* data loading is host-side with length-bucketed fixed-shape padded batches
  (``tpuasr.data``) so nothing recompiles across an epoch;
* training is data-parallel over a ``jax.sharding.Mesh`` (``tpuasr.parallel``)
  with Orbax checkpointing.

Reference provenance: see SURVEY.md (the reference mount was empty at survey
time; structure reconstructed from BASELINE.json + public-repo knowledge).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPUASR_PLATFORM"):
    # Escape hatch for scripts/tests: the sandbox sitecustomize force-selects
    # the axon TPU plugin regardless of JAX_PLATFORMS, so offer an explicit
    # override that works as long as tpuasr is imported before first backend
    # use (e.g. TPUASR_PLATFORM=cpu).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPUASR_PLATFORM"])


def __getattr__(name):
    """Lazy top-level API: tpuasr.Featurizer, tpuasr.Trainer, ... without
    importing jax-heavy modules at package import time."""
    _api = {
        "FeatureConfig": "tpuasr.features",
        "Featurizer": "tpuasr.features",
        "FusedFeaturizer": "tpuasr.features.pallas_fused",
        "ctc_loss": "tpuasr.losses",
        "create_model": "tpuasr.models",
        "greedy_decode": "tpuasr.decode",
        "ctc_beam_search": "tpuasr.decode",
        "BeamSearchConfig": "tpuasr.decode",
        "Trainer": "tpuasr.train",
        "TrainConfig": "tpuasr.train",
        "AudioLoader": "tpuasr.data",
        "LoaderConfig": "tpuasr.data",
        "make_synthetic_corpus": "tpuasr.data",
        "StreamingRecognizer": "tpuasr.serve",
    }
    if name in _api:
        import importlib

        return getattr(importlib.import_module(_api[name]), name)
    raise AttributeError(f"module 'tpuasr' has no attribute {name!r}")
