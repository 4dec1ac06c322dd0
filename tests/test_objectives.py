"""Trainer objective variants end-to-end: seq2seq_ce (ResNetED) and
framewise_ce with the SSVAE adapter model."""

import pytest

import numpy as np

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.features import FeatureConfig
from tpuasr.train import TrainConfig, Trainer


@pytest.mark.slow
def test_trainer_seq2seq_ce(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=8, vocab_size=5,
                                   min_tokens=2, max_tokens=4, seed=4)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=6))
    cfg = TrainConfig(model="resnet_ed", num_classes=5,
                      model_kwargs=dict(stem_channels=8, stage_channels=(8,),
                                        blocks_per_stage=1, dec_hidden=16,
                                        emb_dim=8, dropout=0.0),
                      objective="seq2seq_ce", lr=1e-2, warmup_steps=5)
    trainer = Trainer(cfg, FeatureConfig(n_mels=32))
    state = trainer.init_state(loader.make_batch(loader.batch_plan(0)[0]))
    first = last = None
    for epoch in range(12):
        loader.epoch = epoch
        for batch in loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
            if first is None:
                first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)


def test_trainer_framewise_ssvae(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=8, vocab_size=5,
                                   min_tokens=2, max_tokens=3, seed=6)
    fc = FeatureConfig(n_mels=32, splice_left=2, splice_right=2)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, frame_label_cfg=fc))
    cfg = TrainConfig(model="ssvae", num_classes=5,
                      model_kwargs=dict(latent_dim=8, hidden=(32,)),
                      objective="framewise_ce", label_stride=1,
                      lr=3e-3, warmup_steps=5)
    trainer = Trainer(cfg, fc)
    fixed = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(fixed)

    def eval_loss(state):
        return float(trainer._loss_fn(
            state.params, state.batch_stats,
            {k: np.asarray(v) for k, v in fixed.items() if k != "ids"},
            None, False)[0])

    first = eval_loss(state)
    for epoch in range(6):
        loader.epoch = epoch
        for batch in loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
    last = eval_loss(state)
    assert np.isfinite(last)
    assert last < first, (first, last)


@pytest.mark.slow
def test_trainer_ssvae_elbo_semi_supervised(tmp_path):
    """The M2 ELBO objective end-to-end through the Trainer: half the
    corpus stripped of segments (-> unlabeled frames), loss decreases."""
    corpus = make_synthetic_corpus(tmp_path, num_utts=8, vocab_size=4,
                                   min_tokens=2, max_tokens=3, seed=7)
    # Strip alignments from half the utterances: semi-supervised split.
    from tpuasr.data.manifest import read_manifest, write_manifest
    utts = read_manifest(corpus.manifest)
    for u in utts[::2]:
        u.segments = []
    write_manifest(corpus.manifest, utts)

    fc = FeatureConfig(n_mels=24, splice_left=1, splice_right=1)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, frame_label_cfg=fc,
                                      unlabeled_frames=True))
    # The loader marks segment-less utterances with -1 frame labels.
    batches = list(loader)
    fl = np.concatenate([b["frame_labels"].reshape(-1) for b in batches])
    assert (fl == -1).any() and (fl >= 0).any()

    cfg = TrainConfig(model="ssvae", num_classes=4,
                      model_kwargs=dict(latent_dim=6, hidden=(24,)),
                      objective="ssvae_elbo", ssvae_alpha=2.0,
                      lr=3e-3, warmup_steps=5)
    trainer = Trainer(cfg, fc)
    fixed = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(fixed)

    def eval_loss(state):
        return float(trainer._loss_fn(
            state.params, state.batch_stats,
            {k: np.asarray(v) for k, v in fixed.items() if k != "ids"},
            None, False)[0])

    first = eval_loss(state)
    for epoch in range(4):
        loader.epoch = epoch
        for batch in loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
            assert np.isfinite(float(m["loss"]))
    last = eval_loss(state)
    assert np.isfinite(last)
    assert last < first, (first, last)
