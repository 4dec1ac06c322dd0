"""Randomized robustness sweeps (slow): CTC parity vs torch across many
random shapes; training determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.losses import ctc_loss

from tests.test_ctc import torch_ctc


@pytest.mark.slow
def test_ctc_fuzz_vs_torch():
    rng = np.random.default_rng(1234)
    for trial in range(20):
        B = int(rng.integers(1, 6))
        T = int(rng.integers(4, 80))
        C = int(rng.integers(2, 40))
        U = int(rng.integers(1, max(2, T // 2)))
        logits = rng.standard_normal((B, T, C)).astype(np.float32) * \
            rng.uniform(0.5, 3.0)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        labels = rng.integers(1, C, size=(B, U)).astype(np.int32) \
            if C > 1 else np.zeros((B, U), np.int32)
        il = rng.integers(1, T + 1, size=(B,)).astype(np.int32)
        ll = rng.integers(0, U + 1, size=(B,)).astype(np.int32)
        ours = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
        ref = torch_ctc(lp, labels, il, ll)
        # zero_infinity handling matches torch's (both zero infeasible rows).
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"trial {trial} "
                                           f"B{B} T{T} C{C} U{U}")


@pytest.mark.slow
def test_training_determinism(tmp_path):
    """Same seed -> bitwise-identical losses across two fresh runs."""
    from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer

    corpus = make_synthetic_corpus(tmp_path, num_utts=8, vocab_size=5,
                                   seed=21)

    def run():
        loader = AudioLoader(corpus.manifest,
                             LoaderConfig(batch_size=4, max_label_len=8,
                                          seed=5))
        cfg = TrainConfig(model="deepspeech_ctc", num_classes=5,
                          model_kwargs=dict(rnn_hidden=16, rnn_layers=1,
                                            conv_channels=4, dropout=0.1),
                          seed=7, warmup_steps=2)
        tr = Trainer(cfg, FeatureConfig(n_mels=32))
        state = tr.init_state(loader.make_batch(loader.batch_plan(0)[0]))
        losses = []
        for epoch in range(2):
            loader.epoch = epoch
            for batch in loader:
                state, m = tr.train_step(state, tr._device_batch(batch))
                losses.append(float(m["loss"]))
        return losses

    a = run()
    b = run()
    assert a == b, (a, b)
