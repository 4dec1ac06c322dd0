"""Grain pipeline: same batches as the plain loader + mid-epoch resume."""

import numpy as np
import pytest

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.data.grain_pipeline import GRAIN_AVAILABLE, GrainAudioPipeline

pytestmark = pytest.mark.skipif(not GRAIN_AVAILABLE,
                                reason="grain unavailable")


def make(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=12, vocab_size=5,
                                   seed=8)
    return AudioLoader(corpus.manifest,
                       LoaderConfig(batch_size=4, max_label_len=8, seed=1))


def test_matches_plain_loader(tmp_path):
    loader = make(tmp_path)
    pipe = GrainAudioPipeline(loader)
    plain = list(loader.batch_plan(0))
    got = list(pipe.iter_epoch(0))
    assert len(got) == len(plain)
    for g, idxs in zip(got, plain):
        ref = loader.make_batch(idxs)
        np.testing.assert_array_equal(g["wav"], ref["wav"])
        np.testing.assert_array_equal(g["tokens"], ref["tokens"])


def test_midepoch_resume(tmp_path):
    loader = make(tmp_path)
    pipe = GrainAudioPipeline(loader)
    it = pipe.iter_epoch(0)
    first = next(it)
    state = pipe.get_state()

    # Same loader (same corpus/seed) in a fresh pipeline object.
    pipe2 = GrainAudioPipeline(loader)
    it2 = pipe2.set_state(state)
    a = next(it)
    b = next(it2)
    np.testing.assert_array_equal(a["wav"], b["wav"])
    assert a["ids"] == b["ids"]
