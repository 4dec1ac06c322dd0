#!/usr/bin/env python
"""Stage attribution for the training step (VERDICT r3 next #8).

The B=128/bf16 train step measures 83 ms (MFU 0.18) while the serving AM
forward runs at MFU 0.73 — before touching kernels, this pins down WHERE
the step time lives. Each stage is timed as its own jitted program with
the queue-then-drain discipline (see .claude/skills/verify: block_until_
ready is not a fence under axon):

  feat      featurizer forward only (plain XLA chain vs Pallas fused)
  am_fwd    AM forward (train=False, no BN update)
  loss_fwd  featurize + AM(train) + CTC loss forward
  grad      value_and_grad of loss_fwd (the fwd+bwd bulk)
  step      the full shipped train_step (grad + optimizer + clip)

The deltas step-grad and grad-loss_fwd attribute optimizer and backward
cost; feat tells whether the UNFUSED featurizer is riding the train path
(the fused one only served inference until round 4).

Prints one JSON line per stage; --fused A/Bs the fused featurizer.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def timed(fn, *args, n=10):
    out = fn(*args)
    np.asarray(jax_leaf(out))                  # compile + drain
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax_leaf(out))
    return (time.perf_counter() - t0) / n


def jax_leaf(tree):
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return leaf[(0,) * leaf.ndim] if leaf.ndim else leaf


def main():
    # Wedge-proofing (VERDICT r4 next #2): probe + CPU pin before backend
    # init, so the profile artifact can't hang the session.
    from benchmarks.harness import decide_platform
    decide_platform()

    import jax
    import jax.numpy as jnp

    from benchmarks.common import synth_wav
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer

    B = 128
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    seconds = 5.0
    bf16 = "--f32" not in sys.argv
    fused = "--fused" in sys.argv
    ctc_impl = (sys.argv[sys.argv.index("--ctc") + 1]
                if "--ctc" in sys.argv else "fb")
    dropout0 = "--dropout0" in sys.argv
    fused_proj = "--fused-proj" in sys.argv
    U = 24
    rng = np.random.default_rng(0)
    batch = dict(
        wav=synth_wav(rng, B, seconds),
        wav_lens=np.full((B,), int(8000 * seconds), np.int32),
        tokens=rng.integers(1, 64, size=(B, U)).astype(np.int32),
        token_lens=np.full((B,), U, np.int32),
        real=np.ones((B,), bool),
    )
    on_tpu = jax.default_backend() == "tpu"
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=64,
                      warmup_steps=1, bf16_compute=bf16, ctc_impl=ctc_impl,
                      fused_featurizer=fused and on_tpu,
                      model_kwargs=dict(pallas_gru=on_tpu,
                                        bf16_gru=bf16 and on_tpu,
                                        bf16_conv=bf16,
                                        fused_proj=fused_proj and on_tpu,
                                        **({"dropout": 0.0} if dropout0
                                           else {})))
    trainer = Trainer(cfg, FeatureConfig())
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)
    ftabs = trainer.feat_tables
    fz = trainer.featurizer

    res = {}

    @jax.jit
    def feat_only(wav, lens, ftabs):
        return fz._featurize(wav, lens, tables=ftabs)

    res["feat"] = timed(feat_only, dbatch["wav"], dbatch["wav_lens"], ftabs)

    @jax.jit
    def am_fwd(params, stats, wav, lens, ftabs):
        feats, flens = fz._featurize(wav, lens, tables=ftabs)
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        return trainer.model.apply({"params": params, "batch_stats": stats},
                                   feats, flens, train=False)

    res["am_fwd"] = timed(am_fwd, state.params, state.batch_stats,
                          dbatch["wav"], dbatch["wav_lens"], ftabs)

    @jax.jit
    def am_train(params, stats, wav, lens, ftabs):
        feats, flens = fz._featurize(wav, lens, tables=ftabs)
        if bf16:
            feats = feats.astype(jnp.bfloat16)
        (logp, out_lens), _ = trainer.model.apply(
            {"params": params, "batch_stats": stats}, feats, flens,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return logp, out_lens

    res["am_train"] = timed(am_train, state.params, state.batch_stats,
                            dbatch["wav"], dbatch["wav_lens"], ftabs)

    # CTC loss alone, fwd and fwd+grad, on precomputed posteriors.
    logp0, ol0 = am_train(state.params, state.batch_stats, dbatch["wav"],
                          dbatch["wav_lens"], ftabs)
    logp0 = jax.block_until_ready(logp0.astype(jnp.float32))

    @jax.jit
    def ctc_fwd(logp, tokens, out_lens, token_lens):
        return trainer._ctc(logp, tokens, out_lens, token_lens).sum()

    @jax.jit
    def ctc_grad(logp, tokens, out_lens, token_lens):
        return jax.value_and_grad(
            lambda lp: trainer._ctc(lp, tokens, out_lens,
                                    token_lens).sum())(logp)

    res["ctc_fwd"] = timed(ctc_fwd, logp0, dbatch["tokens"], ol0,
                           dbatch["token_lens"])
    res["ctc_grad"] = timed(ctc_grad, logp0, dbatch["tokens"], ol0,
                            dbatch["token_lens"])

    @jax.jit
    def loss_fwd(params, stats, batch, ftabs):
        loss, _ = trainer._loss_fn(params, stats, batch,
                                   jax.random.PRNGKey(0), True, ftabs)
        return loss

    res["loss_fwd"] = timed(loss_fwd, state.params, state.batch_stats,
                            dbatch, ftabs)

    @jax.jit
    def am_grad(params, stats, wav, lens, ftabs):
        def f(p):
            feats, flens = fz._featurize(wav, lens, tables=ftabs)
            if bf16:
                feats = feats.astype(jnp.bfloat16)
            (logp, _), _ = trainer.model.apply(
                {"params": p, "batch_stats": stats}, feats, flens,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return logp.astype(jnp.float32).sum()
        return jax.grad(f)(params)

    res["am_grad"] = timed(am_grad, state.params, state.batch_stats,
                           dbatch["wav"], dbatch["wav_lens"], ftabs)

    @jax.jit
    def grad_fn(params, stats, batch, ftabs):
        (loss, _), grads = jax.value_and_grad(
            trainer._loss_fn, has_aux=True)(
                params, stats, batch, jax.random.PRNGKey(0), True, ftabs)
        return loss, grads

    res["grad"] = timed(grad_fn, state.params, state.batch_stats,
                        dbatch, ftabs)

    # Full shipped step (donates state: re-thread it).
    def step(state):
        s, m = trainer.train_step(state, dbatch, ftabs)
        return s, m

    s, m = step(state)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        s, m = step(s)
    np.asarray(m["loss"])
    res["step"] = (time.perf_counter() - t0) / n

    # Train-step roofline (VERDICT r4 next #5): XLA-estimated FLOPs of the
    # grad program + analytic Pallas-GRU correction (custom calls report
    # 0 flops): 1x forward + ~2x backward of the recurrence matmuls.
    rl = {}
    try:
        from tpuasr.features.reference import num_frames
        from tpuasr.utils.profiling import (cost_analysis, gru_param_flops,
                                            roofline)
        ca = cost_analysis(grad_fn, state.params, state.batch_stats,
                           dbatch, ftabs)
        t_out = -(-int(num_frames(trainer.featurizer.cfg,
                                  int(8000 * seconds))) // 2)
        corr = (3.0 * gru_param_flops(state.params, B, t_out)
                if on_tpu else 0.0)
        rl = roofline(grad_fn,
                      (state.params, state.batch_stats, dbatch, ftabs),
                      res["step"], flops=ca["flops"] + corr,
                      bytes_accessed=ca["bytes"])
    except Exception as e:
        rl = {"error": str(e)}

    out = {"metric": "train_step_profile_ms", "batch_size": B,
           "bf16": bf16, "fused_featurizer": fused, "ctc_impl": ctc_impl,
           "dropout0": dropout0, "fused_proj": fused_proj,
           "backend": jax.default_backend(),
           **{k: round(v * 1e3, 2) for k, v in res.items()},
           "bwd_minus_fwd_ms": round((res["grad"] - res["loss_fwd"]) * 1e3,
                                     2),
           "opt_ms": round((res["step"] - res["grad"]) * 1e3, 2),
           "utt_per_sec": round(B / res["step"], 1),
           "train_mfu": round(rl.get("mfu", 0.0), 4),
           "achieved_tflops": round(rl.get("achieved_tflops", 0.0), 2),
           "hbm_frac": round(rl.get("hbm_frac", 0.0), 4),
           "bound": rl.get("bound")}
    line = json.dumps(out)
    print(line)
    if "--out" in sys.argv:
        Path(sys.argv[sys.argv.index("--out") + 1]).write_text(line + "\n")


if __name__ == "__main__":
    main()
