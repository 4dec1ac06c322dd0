#!/usr/bin/env python
"""BASELINE config #2: ResNet-CTC greedy-decode inference on a dev-clean-style
utterance batch. Reports utterances/sec/chip and RTF breakdown."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tpuasr.decode import greedy_decode
    from tpuasr.features import FeatureConfig, Featurizer
    from tpuasr.models import create_model
    from tpuasr.utils.profiling import rtf_breakdown

    B, SECONDS = 128, 10.0
    rng = np.random.default_rng(0)
    wav = jnp.asarray(synth_wav(rng, B, SECONDS))
    lens = jnp.full((B,), wav.shape[1], jnp.int32)

    fz = Featurizer(FeatureConfig())
    model = create_model("resnet_ctc", num_classes=64)
    feats0, flens0 = fz(wav, lens)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, flens0, train=False)

    import functools

    featurize = jax.jit(fz._featurize)   # plain-Featurizer tables are KBs
    # Weights ride as a partial-bound ARGUMENT (not a jit-captured
    # constant): capturing multi-MB constants permanently degrades
    # dispatch on the axon terminal (see bench.py).
    am_jit = jax.jit(lambda v, f, fl: model.apply(v, f, fl, train=False))
    am = functools.partial(am_jit, variables)
    dec = jax.jit(greedy_decode)

    bd = rtf_breakdown(featurize, am, dec, wav, lens, B * SECONDS)
    detail(json.dumps(bd, indent=2))
    utt_per_sec = B / bd["e2e"]["seconds"]
    emit(2, "resnet_greedy_utt_per_sec_chip", utt_per_sec, "utt/s",
         rtf_x=round(bd["e2e"]["x_realtime"], 1),
         feat_x=round(bd["featurizer"]["x_realtime"], 1),
         am_x=round(bd["am"]["x_realtime"], 1),
         decode_x=round(bd["decode"]["x_realtime"], 1),
         backend=jax.default_backend())


if __name__ == "__main__":
    main()
