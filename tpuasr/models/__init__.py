"""Acoustic models as jitted Flax modules (reference: asr/models/<name>/,
one package per AM with model.py/train.py/predict.py — SURVEY.md section 2.1).

Common contract (fixed shapes, masked):

    model.apply(vars, feats, feat_lens, train=...)
        -> (log_probs (B, T_out, C), out_lens (B,))

feats: (B, T, F) featurizer output; out_lens: valid output frames after the
model's time downsampling (the conv stride arithmetic every CTC length
depends on). blank id = 0 everywhere.

Registry maps the reference's CLI model names to constructors.
"""

from tpuasr.models.deepspeech_ctc import DeepSpeechCTC
from tpuasr.models.resnet_ctc import ResNetCTC
from tpuasr.models.resnet_ed import ResNetED
from tpuasr.models.capsnet import CapsNetCTC
from tpuasr.models.ssvae import SSVAEAM

MODEL_REGISTRY = {
    # reference name -> (constructor, default kwargs)
    "resnet_ctc": ResNetCTC,
    "resnet_ed": ResNetED,
    "deepspeech_ctc": DeepSpeechCTC,
    "deepspeech_var": DeepSpeechCTC,   # variant: configured via kwargs
    "capsule1": CapsNetCTC,
    "ssvae": SSVAEAM,
}


def create_model(name: str, num_classes: int, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](num_classes=num_classes, **kwargs)


__all__ = ["ResNetCTC", "DeepSpeechCTC", "CapsNetCTC", "MODEL_REGISTRY",
           "create_model"]
