"""Data pipeline tests: manifest round-trip, wav IO, bucketing, fixed-shape
bucketed batches (compile-cache discipline, SURVEY.md section 4.2)."""

import numpy as np

from tpuasr.data import (AudioLoader, LoaderConfig, make_buckets,
                         make_synthetic_corpus, read_manifest)


def test_synthetic_corpus_roundtrip(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=6, vocab_size=5)
    utts = read_manifest(corpus.manifest)
    assert len(utts) == 6
    assert all(1 <= t <= 4 for u in utts for t in u.tokens)
    from tpuasr.data.manifest import load_wav
    data, sr = load_wav(utts[0].wav)
    assert sr == 8000
    assert data.dtype == np.float32
    assert len(data) == utts[0].num_samples
    assert np.abs(data).max() <= 1.0


def test_bucket_spec():
    lens = [100, 150, 200, 800, 900, 1000]
    spec = make_buckets(lens, max_waste=0.3, max_buckets=4)
    assert spec.boundaries[-1] == 1000
    for n in lens:
        b = spec.bucket_of(n)
        assert b >= 0 and spec.padded_len(b) >= n
    assert spec.bucket_of(5000) == -1


def test_loader_fixed_shapes(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=20, vocab_size=6,
                                   min_tokens=2, max_tokens=8)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8))
    shapes = set()
    n_rows = 0
    seen_ids = set()
    for batch in loader:
        assert batch["wav"].shape[0] == 4
        shapes.add(batch["wav"].shape)
        assert batch["tokens"].shape == (4, 8)
        assert np.all(batch["wav_lens"] <= batch["wav"].shape[1])
        assert np.all(batch["token_lens"] > 0)
        n_rows += int(batch["real"].sum())
        seen_ids.update(np.asarray(batch["ids"])[batch["real"]].tolist())
    # Bounded shape count; every utterance seen exactly once.
    assert len(shapes) <= 6
    assert n_rows == 20
    assert len(seen_ids) == 20


def test_loader_deterministic_resume(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=10, vocab_size=5)
    l1 = AudioLoader(corpus.manifest, LoaderConfig(batch_size=2, seed=3))
    l2 = AudioLoader(corpus.manifest, LoaderConfig(batch_size=2, seed=3))
    assert l1.batch_plan(0) == l2.batch_plan(0)
    assert l1.batch_plan(1) != l1.batch_plan(0)  # epochs differ


def test_loader_featurizer_integration(tmp_path):
    """Loader batches flow into the jitted featurizer with bucket shapes."""
    from tpuasr.features import FeatureConfig, Featurizer
    corpus = make_synthetic_corpus(tmp_path, num_utts=8, vocab_size=5)
    loader = AudioLoader(corpus.manifest, LoaderConfig(batch_size=4))
    fz = Featurizer(FeatureConfig())
    for batch in loader:
        feats, flen = fz(batch["wav"], batch["wav_lens"])
        assert feats.shape[0] == 4
        assert int(np.asarray(flen).max()) <= feats.shape[1]


def test_loader_augmentation(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=4, vocab_size=5,
                                   seed=9)
    plain = AudioLoader(corpus.manifest,
                        LoaderConfig(batch_size=4, shuffle=False))
    aug = AudioLoader(corpus.manifest,
                      LoaderConfig(batch_size=4, shuffle=False, augment=True,
                                   gain_range=(0.5, 0.5), noise_std=0.0))
    b0 = plain.make_batch(plain.batch_plan(0)[0])
    b1 = aug.make_batch(aug.batch_plan(0)[0])
    # Pure gain 0.5: wave exactly halved.
    np.testing.assert_allclose(b1["wav"], b0["wav"] * 0.5, rtol=1e-6)
    noisy = AudioLoader(corpus.manifest,
                        LoaderConfig(batch_size=4, shuffle=False,
                                     augment=True, gain_range=(1.0, 1.0),
                                     noise_std=0.01))
    b2 = noisy.make_batch(noisy.batch_plan(0)[0])
    diff = b2["wav"] - b0["wav"]
    assert 0.005 < diff[b2["wav"] != 0].std() < 0.02


def test_loader_cache_bounded_and_streaming(tmp_path):
    """cache_bytes bounds the decoded-wav LRU (no whole-corpus RAM blowup);
    cache_bytes=0 streams per batch. Batches identical either way, across
    two epochs (evict + re-decode path)."""
    corpus = make_synthetic_corpus(tmp_path, num_utts=12, vocab_size=4)
    cfgs = dict(batch_size=4, shuffle=False)
    ref = AudioLoader(corpus.manifest, LoaderConfig(**cfgs))
    bounded = AudioLoader(corpus.manifest,
                          LoaderConfig(**cfgs, cache_bytes=8192))
    stream = AudioLoader(corpus.manifest, LoaderConfig(**cfgs, cache_bytes=0))
    for _ in range(2):
        for br, bb, bs in zip(ref, bounded, stream):
            for k in ("wav", "wav_lens", "tokens", "token_lens", "real"):
                np.testing.assert_array_equal(br[k], bb[k], err_msg=k)
                np.testing.assert_array_equal(br[k], bs[k], err_msg=k)
        assert (bounded._cache_nbytes <= 8192 or len(bounded._cache) == 1)
    assert not stream._cache and ref._cache  # default still caches
