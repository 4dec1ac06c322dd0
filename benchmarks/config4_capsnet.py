#!/usr/bin/env python
"""BASELINE config #4: CapsNet AM (dynamic-routing kernels) train + infer."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def main():
    import jax

    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.profiling import time_fn

    B, SECONDS, U = 8, 5.0, 16
    if "--batch" in sys.argv:      # routing is matmul-heavy: batch helps
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    rng = np.random.default_rng(0)
    batch = dict(
        wav=synth_wav(rng, B, SECONDS),
        wav_lens=np.full((B,), int(8000 * SECONDS), np.int32),
        tokens=rng.integers(1, 48, size=(B, U)).astype(np.int32),
        token_lens=np.full((B,), U, np.int32),
        real=np.ones((B,), bool),
    )
    on_tpu = jax.default_backend() == "tpu"
    no_fused = "--no-fused-routing" in sys.argv   # A/B: XLA routing path
    cfg = TrainConfig(model="capsule1", num_classes=48, warmup_steps=1,
                      model_kwargs=dict(
                          pallas_routing=on_tpu and not no_fused))
    trainer = Trainer(cfg, FeatureConfig())
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)

    state, m = trainer.train_step(state, dbatch)
    jax.block_until_ready(m["loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = trainer.train_step(state, dbatch)
    jax.block_until_ready(m["loss"])
    train_ms = (time.perf_counter() - t0) / n * 1e3

    infer = jax.jit(lambda b: trainer.eval_step(state, b)["tokens"])
    t_inf = time_fn(infer, dbatch)
    detail(f"loss={float(m['loss']):.3f}")
    import json

    from tpuasr.utils.profiling import roofline
    try:
        rl = roofline(type(trainer).train_step, (trainer, state, dbatch),
                      train_ms / 1e3)
        rl_inf = roofline(infer, (dbatch,), t_inf)
    except Exception as e:
        rl, rl_inf = {"error": str(e)}, {}
    detail("roofline train: " + json.dumps(rl))
    detail("roofline infer: " + json.dumps(rl_inf))
    emit(4, "capsnet_train_step_ms", train_ms, "ms",
         infer_ms=round(t_inf * 1e3, 2), batch_size=B,
         fused_routing=on_tpu and not no_fused,
         backend=jax.default_backend(),
         mfu=round(rl.get("mfu", 0.0), 4),
         achieved_tflops=round(rl.get("achieved_tflops", 0.0), 2),
         hbm_frac=round(rl.get("hbm_frac", 0.0), 4),
         bound=rl.get("bound"),
         roofline_frac=round(rl.get("roofline_frac", 0.0), 4),
         infer_mfu=round(rl_inf.get("mfu", 0.0), 4),
         infer_bound=rl_inf.get("bound"))


if __name__ == "__main__":
    main()
