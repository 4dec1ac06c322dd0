"""SpecAugment (on-device) + gradient accumulation (optax.MultiSteps)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpuasr.features.augment import spec_augment


def _feats(B=3, T=40, F=24, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((B, T, F)).astype(np.float32) + 1.0
    lens = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    lens[0] = T
    for b in range(B):
        f[b, lens[b]:] = 0.0
    return jnp.asarray(f), jnp.asarray(lens)


def test_spec_augment_shape_dtype_and_determinism():
    feats, lens = _feats()
    key = jax.random.PRNGKey(0)
    out1 = spec_augment(feats, lens, key)
    out2 = spec_augment(feats, lens, key)
    assert out1.shape == feats.shape and out1.dtype == feats.dtype
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # Different keys, different masks.
    out3 = spec_augment(feats, lens, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_spec_augment_masks_only_zero_cells():
    feats, lens = _feats()
    # Make every valid cell nonzero so masked cells are identifiable.
    feats = jnp.where(feats == 0, 0.0, feats + 10.0)
    out = np.asarray(spec_augment(feats, lens, jax.random.PRNGKey(2),
                                  freq_masks=2, freq_width=8,
                                  time_masks=2, time_frac=0.2))
    ref = np.asarray(feats)
    changed = out != ref
    # Changed cells are exactly zeroed, never altered to something else.
    assert (out[changed] == 0).all()
    # Some masking actually happened at these settings.
    assert changed.any()
    # Padding stays zero.
    for b, ln in enumerate(np.asarray(lens)):
        assert (out[b, ln:] == 0).all()


def test_spec_augment_under_jit_and_fraction_bounded():
    feats, lens = _feats(B=4, T=64, F=32, seed=3)
    f = jax.jit(lambda x, l, k: spec_augment(x, l, k, time_frac=0.1))
    out = np.asarray(f(feats, lens, jax.random.PRNGKey(4)))
    ref = np.asarray(feats)
    frac = (out != ref).mean()
    assert 0.0 < frac < 0.6   # masks are bounded, not wholesale erasure


def test_grad_accumulation_applies_every_k():
    from tpuasr.data import make_synthetic_corpus
    from tpuasr.data.loader import AudioLoader, LoaderConfig
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        corpus = make_synthetic_corpus(td + "/c", num_utts=8, vocab_size=5,
                                       min_tokens=2, max_tokens=3)
        loader = AudioLoader(corpus.manifest,
                             LoaderConfig(batch_size=4, max_label_len=4))
        cfg = TrainConfig(model="deepspeech_ctc", num_classes=5,
                          model_kwargs=dict(rnn_hidden=16, rnn_layers=1,
                                            conv_channels=4, dropout=0.0),
                          accum_steps=2, warmup_steps=1)
        tr = Trainer(cfg, FeatureConfig(n_mels=32))
        batch = loader.make_batch(loader.batch_plan(0)[0])
        state = tr.init_state(batch)
        p0 = jax.device_get(state.params)
        db = tr._device_batch(batch)
        # Micro-steps 1-3 must not move params: odd steps accumulate, and
        # the first APPLIED update (after micro-step 2) uses the warmup
        # schedule's step-0 lr of 0.0. The second application (after
        # micro-step 4) runs at full lr and must move them.
        leaves_prev = jax.tree_util.tree_leaves(p0)
        for micro in range(1, 5):
            state, m = tr.train_step(state, tr._device_batch(batch))
            leaves = jax.tree_util.tree_leaves(
                jax.device_get(state.params))
            moved = any(not np.array_equal(a, c)
                        for a, c in zip(leaves_prev, leaves))
            assert moved == (micro == 4), (micro, moved)
            leaves_prev = leaves
        assert np.isfinite(float(m["loss"]))
        del db


def test_spec_augment_train_step_runs():
    from tpuasr.data import make_synthetic_corpus
    from tpuasr.data.loader import AudioLoader, LoaderConfig
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        corpus = make_synthetic_corpus(td + "/c", num_utts=4, vocab_size=5,
                                       min_tokens=2, max_tokens=3)
        loader = AudioLoader(corpus.manifest,
                             LoaderConfig(batch_size=4, max_label_len=4))
        cfg = TrainConfig(model="deepspeech_ctc", num_classes=5,
                          model_kwargs=dict(rnn_hidden=16, rnn_layers=1,
                                            conv_channels=4, dropout=0.0),
                          spec_augment=True, warmup_steps=1)
        tr = Trainer(cfg, FeatureConfig(n_mels=32))
        batch = loader.make_batch(loader.batch_plan(0)[0])
        state = tr.init_state(batch)
        state, m = tr.train_step(state, tr._device_batch(batch))
        assert np.isfinite(float(m["loss"]))
        # Eval path never augments: same state, same batch, same loss twice.
        e1 = tr.eval_step(state, tr._device_batch(batch))
        e2 = tr.eval_step(state, tr._device_batch(batch))
        assert float(e1["loss"]) == float(e2["loss"])


def test_cosine_schedule_decays():
    import optax
    from tpuasr.train import TrainConfig
    from tpuasr.train.loop import make_optimizer

    cfg = TrainConfig(lr=1e-3, warmup_steps=10, lr_schedule="cosine",
                      decay_steps=100, min_lr_frac=0.1)
    tx = make_optimizer(cfg)      # builds without error
    assert isinstance(tx, optax.GradientTransformation)
    # Probe the schedule directly: ramp, peak, decay to the floor.
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, cfg.warmup_steps, cfg.decay_steps,
        end_value=cfg.lr * cfg.min_lr_frac)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9
    assert float(sched(100)) <= 1e-4 + 1e-9
    import pytest
    with pytest.raises(ValueError, match="lr_schedule"):
        make_optimizer(TrainConfig(lr_schedule="nope"))
