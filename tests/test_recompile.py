"""Fixed-shape discipline: after the first epoch warms the jit caches, later
epochs must not trigger ANY new compilation (SURVEY.md section 4.2)."""

import pytest

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.features import FeatureConfig
from tpuasr.train import TrainConfig, Trainer


@pytest.mark.slow
def test_zero_recompile_across_epochs(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=24, vocab_size=6,
                                   min_tokens=2, max_tokens=6, seed=3)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8,
                                      max_buckets=3))
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=6,
                      model_kwargs=dict(rnn_hidden=16, rnn_layers=1,
                                        conv_channels=4, dropout=0.0),
                      warmup_steps=1)
    trainer = Trainer(cfg, FeatureConfig(n_mels=32))
    init_batch = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(init_batch)

    # NOTE: the jit cache is a class attribute shared by all Trainer
    # instances (static self), so assert on DELTAS, not absolute size.
    base = trainer.train_step._cache_size()

    # Epoch 0: warm every bucket shape.
    loader.epoch = 0
    for batch in loader:
        state, _ = trainer.train_step(state, trainer._device_batch(batch))
    warmed = trainer.train_step._cache_size() - base
    assert warmed >= 1
    # Bucketing bounds the number of distinct compiled programs.
    assert warmed <= len(loader.buckets.boundaries)

    # Epoch 1 (different shuffle order): no new compilations allowed.
    loader.epoch = 1
    for batch in loader:
        state, _ = trainer.train_step(state, trainer._device_batch(batch))
    assert trainer.train_step._cache_size() - base == warmed
