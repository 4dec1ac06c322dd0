"""Frame-wise training path (reference's CapsNet/SSVAE classifier mode):
segments -> frame labels -> per-frame CE -> above-chance frame accuracy."""

import pytest

import numpy as np

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.features import FeatureConfig
from tpuasr.train import TrainConfig, Trainer


def test_frame_labels_from_segments(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=4, vocab_size=5,
                                   min_tokens=3, max_tokens=3, seed=2)
    fc = FeatureConfig(n_mels=32)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, frame_label_cfg=fc))
    batch = loader.make_batch(loader.batch_plan(0)[0])
    fl = batch["frame_labels"]
    assert fl.shape[0] == 4
    # Each utterance is 3 tones of 150ms => ~15 frames per tone at 10ms hop.
    from tpuasr.data.manifest import read_manifest
    utts = {u.id: u for u in read_manifest(corpus.manifest)}
    for j, uid in enumerate(batch["ids"]):
        toks = utts[uid].tokens
        # The label sequence (collapsed) equals the token sequence.
        row = fl[j]
        collapsed = [row[i] for i in range(len(row))
                     if row[i] != 0 and (i == 0 or row[i] != row[i - 1])]
        assert collapsed == toks, (collapsed, toks)


@pytest.mark.slow
def test_framewise_training_learns(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=16, vocab_size=5,
                                   min_tokens=2, max_tokens=4, seed=5)
    fc = FeatureConfig(n_mels=32)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8,
                                      frame_label_cfg=fc))
    cfg = TrainConfig(model="capsule1", num_classes=5,
                      model_kwargs=dict(conv_channels=8, primary_caps=4,
                                        primary_dim=4, class_dim=8),
                      objective="framewise_ce", label_stride=2,
                      lr=3e-3, warmup_steps=5)
    trainer = Trainer(cfg, fc)
    state = trainer.init_state(loader.make_batch(loader.batch_plan(0)[0]))
    first = None
    for epoch in range(3):
        loader.epoch = epoch
        for batch in loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
            if first is None:
                first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.8, (first, last)

    # Frame accuracy above chance (1/5).
    batch = loader.make_batch(loader.batch_plan(0)[0])
    out = trainer.eval_step(state, trainer._device_batch(batch))
    import jax.numpy as jnp
    logp, out_lens = None, None
    # Recompute forward for frame accuracy.
    feats, flens = trainer.featurizer(batch["wav"], batch["wav_lens"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logp, out_lens = trainer.model.apply(variables, jnp.asarray(feats),
                                         jnp.asarray(flens), train=False)
    pred = np.asarray(jnp.argmax(logp, -1))
    fl = batch["frame_labels"][:, ::2][:, :pred.shape[1]]
    correct = total = 0
    for b in range(pred.shape[0]):
        n = int(out_lens[b])
        n = min(n, fl.shape[1])
        correct += (pred[b, :n] == fl[b, :n]).sum()
        total += n
    acc = correct / max(total, 1)
    assert acc > 0.4, acc
