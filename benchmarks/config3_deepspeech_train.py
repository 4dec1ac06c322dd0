#!/usr/bin/env python
"""BASELINE config #3: DeepSpeech-style conv+BiRNN CTC training step (loss
forward+backward) on a small padded batch. Reports train-step ms."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def main():
    import jax

    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.profiling import time_fn

    B, SECONDS, U = 16, 5.0, 24
    rng = np.random.default_rng(0)
    batch = dict(
        wav=synth_wav(rng, B, SECONDS),
        wav_lens=np.full((B,), int(8000 * SECONDS), np.int32),
        tokens=rng.integers(1, 64, size=(B, U)).astype(np.int32),
        token_lens=np.full((B,), U, np.int32),
        real=np.ones((B,), bool),
    )
    import jax as _jax
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=64,
                      warmup_steps=1,
                      model_kwargs=dict(
                          pallas_gru=_jax.default_backend() == "tpu"))
    trainer = Trainer(cfg, FeatureConfig())
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)

    # train_step donates state; time with re-threading.
    state, m = trainer.train_step(state, dbatch)   # compile
    import time
    jax.block_until_ready(m["loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = trainer.train_step(state, dbatch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / n
    detail(f"loss={float(m['loss']):.3f}")
    from tpuasr.utils.profiling import roofline
    try:
        rl = roofline(type(trainer).train_step, (trainer, state, dbatch),
                      dt)
    except Exception as e:
        rl = {"error": str(e)}
    import json
    detail("roofline: " + json.dumps(rl))
    emit(3, "deepspeech_ctc_train_step_ms", dt * 1e3, "ms",
         batch_size=B, audio_seconds_per_step=B * SECONDS,
         utt_per_sec=round(B / dt, 1), backend=jax.default_backend(),
         mfu=round(rl.get("mfu", 0.0), 4),
         achieved_tflops=round(rl.get("achieved_tflops", 0.0), 2),
         hbm_frac=round(rl.get("hbm_frac", 0.0), 4),
         bound=rl.get("bound"),
         roofline_frac=round(rl.get("roofline_frac", 0.0), 4))


if __name__ == "__main__":
    main()
