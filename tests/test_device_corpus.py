"""Device-resident corpus (data/device_corpus.py): the gather-assembled
batches must be BIT-identical to the streaming loader's, in plan order,
across epochs — residency is a placement change, not a data change
(VERDICT r3 next #6)."""

import numpy as np
import pytest

import jax

from tpuasr.data import AudioLoader, LoaderConfig
from tpuasr.data.device_corpus import DeviceCorpus, try_build
from tpuasr.data.synthetic import make_synthetic_corpus
from tpuasr.parallel import make_mesh, shard_batch


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("dc")
    return make_synthetic_corpus(d, num_utts=37, vocab_size=8, seed=3)


def _loaders(corpus, **kw):
    cfg = LoaderConfig(batch_size=8, max_label_len=16, max_buckets=3, **kw)
    return AudioLoader(corpus.manifest, cfg), AudioLoader(corpus.manifest,
                                                          cfg)


def test_batches_bit_identical(corpus):
    stream, resident = _loaders(corpus)
    mesh = make_mesh()
    dc = DeviceCorpus(resident, mesh)
    for epoch in (0, 1):
        got = list(dc.batches(epoch))
        want = stream.batch_plan(epoch)
        assert len(got) == len(want)
        for (n_real, db), chunk in zip(got, want):
            ref = stream.make_batch(chunk)
            assert n_real == int(ref["real"].sum())
            for k in ("wav", "wav_lens", "tokens", "token_lens", "real"):
                np.testing.assert_array_equal(
                    np.asarray(db[k]), ref[k],
                    err_msg=f"epoch {epoch} key {k}")


def test_sharding_matches_shard_batch(corpus):
    """Gather outputs land where shard_batch would have put them."""
    stream, resident = _loaders(corpus)
    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    dc = DeviceCorpus(resident, mesh)
    n_real, db = next(iter(dc.batches(0)))
    ref = shard_batch(stream.make_batch(stream.batch_plan(0)[0]), mesh)
    for k in ("wav", "tokens"):
        assert db[k].sharding == ref[k].sharding, k


def test_budget_fallback(corpus):
    _, resident = _loaders(corpus)
    assert try_build(resident, make_mesh(), max_bytes=64) is None
    with pytest.raises(ValueError):
        DeviceCorpus(resident, make_mesh(), max_bytes=64)


def test_augment_falls_back(corpus):
    _, resident = _loaders(corpus, augment=True)
    assert try_build(resident, make_mesh()) is None


def test_frame_labels_identical(corpus, tmp_path):
    from tpuasr.features import FeatureConfig
    fc = FeatureConfig(n_mels=8)
    stream, resident = _loaders(corpus, frame_label_cfg=fc)
    dc = DeviceCorpus(resident, make_mesh())
    (n_real, db) = next(iter(dc.batches(0)))
    ref = stream.make_batch(stream.batch_plan(0)[0])
    np.testing.assert_array_equal(np.asarray(db["frame_labels"]),
                                  ref["frame_labels"])


def test_trained_params_identical(corpus):
    """A short training run must produce IDENTICAL params streaming vs
    resident (same plan, same contents, same placement => same program)."""
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer

    outs = []
    for device_corpus in (False, "auto"):
        cfg = TrainConfig(model="deepspeech_ctc", num_classes=8,
                          model_kwargs=dict(rnn_hidden=16, rnn_layers=1,
                                            conv_channels=4, dropout=0.0),
                          lr=1e-3, num_epochs=2, warmup_steps=4,
                          log_every=10 ** 9, device_corpus=device_corpus)
        loader = AudioLoader(corpus.manifest,
                             LoaderConfig(batch_size=8, max_label_len=16,
                                          max_buckets=2))
        t = Trainer(cfg, FeatureConfig(n_mels=8))
        state = t.init_state(loader.make_batch(loader.batch_plan(0)[0]))
        for epoch in range(2):
            for n_real, db in t._epoch_batches(loader, epoch):
                state, _ = t.train_step(state, db, t.feat_tables)
        if device_corpus:
            assert t._dc is not None and t._dc[1] is not None, \
                "resident path was expected to engage"
        outs.append(jax.device_get(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_array_equal(a, b)
