"""Data-parallel SERVING: the full decode pipeline (featurize -> AM ->
beam search, optionally LM-fused) jitted over the 8-device mesh equals the
single-device result bit-for-bit on tokens. The reference had no parallel
inference at all (single-threaded host WFST walk, SURVEY.md section 3.2);
here the whole pipeline is one SPMD program sharded on the batch axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.decode import BeamSearchConfig, ctc_beam_search, greedy_decode
from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.lm import train_ngram
from tpuasr.models import create_model
from tpuasr.parallel import make_mesh


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    corpus = make_synthetic_corpus(root, num_utts=16, vocab_size=6,
                                   min_tokens=2, max_tokens=4)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=16, max_label_len=8,
                                      shuffle=False))
    batch = loader.make_batch(loader.batch_plan(0)[0])
    fz = Featurizer(FeatureConfig(n_mels=32))
    model = create_model("resnet_ctc", num_classes=6, stem_channels=4,
                         stage_channels=(4,), blocks_per_stage=1)
    wav = jnp.asarray(batch["wav"])
    lens = jnp.asarray(batch["wav_lens"])
    feats, flens = fz._jit(wav, lens)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats, flens, train=False)
    return fz, model, variables, wav, lens


def _pipeline(fz, model, variables, cfg, lm_bigram=None):
    def fn(wav, wav_lens):
        feats, flens = fz._featurize(wav, wav_lens)
        logp, out_lens = model.apply(variables, feats, flens, train=False)
        return ctc_beam_search(logp, out_lens, cfg, lm_bigram=lm_bigram)
    return fn


@pytest.mark.parametrize("with_lm", [False, True])
def test_sharded_decode_equals_single_device(setup, with_lm):
    fz, model, variables, wav, lens = setup
    assert len(jax.devices()) == 8
    cfg = BeamSearchConfig(beam_width=4, class_topk=4, max_len=64,
                           lm_weight=0.5 if with_lm else 0.0)
    lm_bigram = None
    if with_lm:
        syms = ["<blk>"] + [f"u{i}" for i in range(5)]
        lm = train_ngram([["u1", "u2"], ["u3", "u1", "u4"]] * 4, order=2)
        lm_bigram = lm.fusion_matrix(syms, blank=0)

    fn = _pipeline(fz, model, variables, cfg, lm_bigram)
    ref = jax.jit(fn)(wav, lens)                       # single-program

    mesh = make_mesh(n_data=8)
    shard = NamedSharding(mesh, P("data"))
    wav8 = jax.device_put(wav, shard)
    lens8 = jax.device_put(lens, shard)
    out = jax.jit(fn)(wav8, lens8)                     # SPMD over batch

    np.testing.assert_array_equal(np.asarray(ref["tokens"]),
                                  np.asarray(out["tokens"]))
    np.testing.assert_allclose(np.asarray(ref["scores"]),
                               np.asarray(out["scores"]), rtol=1e-5)
    # The result really is sharded over the data axis (no silent gather).
    assert len(out["scores"].sharding.device_set) == 8


def test_sharded_greedy_equals_single_device(setup):
    fz, model, variables, wav, lens = setup

    def fn(wav, wav_lens):
        feats, flens = fz._featurize(wav, wav_lens)
        logp, out_lens = model.apply(variables, feats, flens, train=False)
        return greedy_decode(logp, out_lens)

    ref_t, ref_l = jax.jit(fn)(wav, lens)
    mesh = make_mesh(n_data=8)
    shard = NamedSharding(mesh, P("data"))
    out_t, out_l = jax.jit(fn)(jax.device_put(wav, shard),
                               jax.device_put(lens, shard))
    np.testing.assert_array_equal(np.asarray(ref_t), np.asarray(out_t))
    np.testing.assert_array_equal(np.asarray(ref_l), np.asarray(out_l))
