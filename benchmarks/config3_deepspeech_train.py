#!/usr/bin/env python
"""BASELINE config #3: DeepSpeech-style conv+BiRNN CTC training step (loss
forward+backward) on a small padded batch. Reports train-step ms.

``--sweep`` additionally scales the same step along the two axes the
roofline says the B=16/f32 point is leaving on the table (memory-bound at
~half the HBM roofline): batch size (more MXU work per HBM byte of
weights/activations) and bf16 compute (half the HBM bytes end-to-end:
bf16 feats + bf16 conv compute + bf16 GRU kernel IO). One JSON line per
operating point; the default line stays the B=16/f32 parity row."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from benchmarks.common import detail, emit, synth_wav  # noqa: E402


def run_point(B, seconds, bf16, label):
    import time

    import jax

    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.profiling import roofline

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
                      warmup_steps=1, bf16_compute=bf16,
                      model_kwargs=dict(pallas_gru=on_tpu,
                                        bf16_gru=bf16 and on_tpu,
                                        bf16_conv=bf16))
    trainer = Trainer(cfg, FeatureConfig())
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)

    # train_step donates state; time with re-threading.
    state, m = trainer.train_step(state, dbatch)   # compile
    jax.block_until_ready(m["loss"])
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = trainer.train_step(state, dbatch)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / n
    detail(f"[{label}] loss={float(m['loss']):.3f}")
    try:
        rl = roofline(type(trainer).train_step, (trainer, state, dbatch),
                      dt)
    except Exception as e:
        rl = {"error": str(e)}
    import json
    detail(f"[{label}] roofline: " + json.dumps(rl))
    emit(3, "deepspeech_ctc_train_step_ms", dt * 1e3, "ms",
         point=label, batch_size=B, bf16=bf16,
         audio_seconds_per_step=B * seconds,
         utt_per_sec=round(B / dt, 1), backend=jax.default_backend(),
         mfu=round(rl.get("mfu", 0.0), 4),
         achieved_tflops=round(rl.get("achieved_tflops", 0.0), 2),
         hbm_frac=round(rl.get("hbm_frac", 0.0), 4),
         bound=rl.get("bound"),
         roofline_frac=round(rl.get("roofline_frac", 0.0), 4))


def main():
    sweep = "--sweep" in sys.argv[1:]
    run_point(16, 5.0, False, "B16_f32")
    if sweep:
        for B, bf16 in ((64, False), (64, True), (128, True)):
            run_point(B, 5.0, bf16, f"B{B}_{'bf16' if bf16 else 'f32'}")


if __name__ == "__main__":
    main()
