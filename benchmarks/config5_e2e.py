#!/usr/bin/env python
"""BASELINE config #5: end-to-end batched pipeline — fused featurizer -> AM ->
CTC beam search on an ASpIRE-style eval set (8 kHz). This is bench.py's
metric with the per-stage breakdown and a WER-delta check (beam vs greedy on
a trained-on-synthetic model would go here; with an untrained AM the delta
column reports beam-vs-greedy token agreement instead)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tpuasr.decode import BeamSearchConfig, get_beam_search
    from tpuasr.features import FeatureConfig
    from tpuasr.features.pallas_fused import FusedFeaturizer
    from tpuasr.models import create_model
    from tpuasr.utils.profiling import rtf_breakdown

    B, SECONDS = 32, 10.0
    if "--batch" in sys.argv:      # stage breakdown at other batch sizes
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    rng = np.random.default_rng(0)
    wav = jnp.asarray(synth_wav(rng, B, SECONDS))
    lens = jnp.full((B,), wav.shape[1], jnp.int32)

    on_tpu = jax.default_backend() == "tpu"
    fz = FusedFeaturizer(FeatureConfig())
    int8 = ("--int8" in sys.argv or "--int8-rec" in sys.argv)
    int8_rec = "--int8-rec" in sys.argv  # quantized serving A/B (KERNELS §6)
    int8_conv = "--int8-conv" in sys.argv  # conv2 tap-GEMM (pallas_conv)
    model = create_model("deepspeech_ctc", num_classes=64,
                         pallas_gru=on_tpu, bf16_gru=on_tpu,
                         fused_proj=on_tpu, int8_proj=int8 and on_tpu,
                         int8_rec=int8_rec and on_tpu,
                         int8_conv=int8_conv and on_tpu)
    feats0, flens0 = fz(wav, lens)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, flens0, train=False)
    bs_cfg = BeamSearchConfig(beam_width=8, class_topk=8, max_len=256)

    import functools

    # Weights/tables ride as partial-bound ARGUMENTS (not jit-captured
    # constants): capturing multi-MB constants permanently degrades
    # dispatch on the axon terminal (see bench.py).
    feat_jit = jax.jit(lambda tb, w, l: fz._featurize(w, l, tables=tb))
    featurize = functools.partial(feat_jit, getattr(fz, "tables", None))
    am_jit = jax.jit(lambda v, f, fl: model.apply(v, f, fl, train=False))
    am = functools.partial(am_jit, variables)
    beam = get_beam_search("auto")
    dec = jax.jit(lambda lp, ol: beam(lp, ol, bs_cfg)["tokens"])

    bd = rtf_breakdown(featurize, am, dec, wav, lens, B * SECONDS)
    if on_tpu:
        # Correct the AM stage for Pallas-GRU flops (custom calls report
        # 0 flops to XLA cost analysis).
        from tpuasr.utils.profiling import (cost_analysis, gru_param_flops,
                                            roofline)
        feats, flens = featurize(wav, lens)
        logp, _ = am(feats, flens)
        ca = cost_analysis(am_jit, variables, feats, flens)
        corr = gru_param_flops(variables["params"], B, int(logp.shape[1]))
        bd["am"]["roofline"] = roofline(
            am_jit, (variables, feats, flens), bd["am"]["seconds"],
            flops=ca["flops"] + corr, bytes_accessed=ca["bytes"])
    detail(json.dumps(bd, indent=2))
    am_rl = bd["am"].get("roofline", {})
    emit(5, "e2e_decode_rtf_x", bd["e2e"]["x_realtime"], "x_realtime",
         utt_per_sec=round(B / bd["e2e"]["seconds"], 1),
         feat_x=round(bd["featurizer"]["x_realtime"], 1),
         am_x=round(bd["am"]["x_realtime"], 1),
         decode_x=round(bd["decode"]["x_realtime"], 1),
         vs_baseline=round(bd["e2e"]["x_realtime"] / 50.0, 2),
         backend=jax.default_backend(),
         am_mfu=round(am_rl.get("mfu", 0.0), 4),
         am_bound=am_rl.get("bound"))


if __name__ == "__main__":
    main()
