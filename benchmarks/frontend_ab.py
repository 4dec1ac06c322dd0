#!/usr/bin/env python
"""A/B the conv frontend formulations at the headline serving shape
(VERDICT r2 item 5): sliding conv vs FrontConv matmul mode, plus bf16 conv
variants, timed on the AM forward alone (B=128, 10 s utterances).

Run on the TPU host. Prints one JSON line per variant.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    from tpuasr.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpuasr.features import FeatureConfig, Featurizer
    from tpuasr.models import create_model
    from tpuasr.utils.profiling import time_fn

    on_tpu = jax.default_backend() == "tpu"
    B, SECONDS, SR, C = 128, 10.0, 8000, 64
    fz = Featurizer(FeatureConfig(sample_rate=SR, n_mels=64))
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((B, int(SR * SECONDS))).astype(np.float32)
    feats, flens = fz(jnp.asarray(wav),
                      jnp.asarray(np.full((B,), wav.shape[1], np.int32)))
    feats = jax.block_until_ready(feats)

    variants = [
        ("conv_f32", dict()),
        ("matmul_f32", dict(matmul_frontend=True)),
        ("conv_bf16", dict(bf16_conv=True)),
        ("matmul_bf16", dict(matmul_frontend=True, bf16_conv=True)),
    ]
    base = dict(num_classes=C, rnn_hidden=512, rnn_layers=4,
                pallas_gru=on_tpu, bf16_gru=on_tpu, fused_proj=on_tpu)
    variables = None
    results = {}
    for name, extra in variants:
        model = create_model("deepspeech_ctc", **base, **extra)
        if variables is None:
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0), feats, flens, train=False)

        @jax.jit
        def fwd(variables, feats, flens, model=model):
            return model.apply(variables, feats, flens, train=False)

        t = time_fn(fwd, variables, feats, flens, iters=10, warmup=2)
        results[name] = round(t * 1000, 2)
        print(json.dumps({"variant": name, "am_ms": results[name]}),
              flush=True)
    print(json.dumps({"metric": "frontend_ab", "results_ms": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
