"""N-gram LM (ARPA backoff) + beam-search shallow fusion tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import BeamSearchConfig, ctc_beam_search
from tpuasr.lm import BOS, EOS, UNK, NGramLM, rescore_nbest, train_ngram

CORPUS = [
    "the cat sat on the mat".split(),
    "the cat ate the fish".split(),
    "a dog sat on a log".split(),
    "the dog ate a bone".split(),
    "a cat and a dog".split(),
]


@pytest.fixture(scope="module")
def lm():
    return train_ngram(CORPUS, order=3)


def _predictables(lm):
    return [w for w in lm.vocab if w != BOS] + (
        [] if UNK in lm.vocab else [UNK])


@pytest.mark.parametrize("context", [
    (), ("the",), ("cat",), (BOS,), ("the", "cat"), ("sat", "on"),
    ("never", "seen"), ("fish",),
])
def test_distributions_normalize(lm, context):
    total = sum(math.exp(lm.cond_logp(w, context))
                for w in _predictables(lm))
    assert total == pytest.approx(1.0, abs=1e-6), (context, total)


def test_witten_bell_values():
    # corpus: a->b once, a->c once: c(a.)=2, T(a)=2 -> p(b|a)=1/4.
    lm2 = train_ngram([["a", "b"], ["a", "c"]], order=2)
    assert lm2.cond_logp("b", ("a",)) == pytest.approx(math.log(0.25))
    assert lm2.cond_logp("c", ("a",)) == pytest.approx(math.log(0.25))


def test_training_text_beats_shuffled(lm):
    seen = lm.perplexity(CORPUS)
    shuffled = lm.perplexity([list(reversed(s)) for s in CORPUS])
    assert seen < shuffled


def test_oov_maps_to_unk(lm):
    assert lm.cond_logp("zzz", ("the",)) == pytest.approx(
        lm.cond_logp(UNK, ("the",)))
    assert lm.score(["the", "zzz"]) > -1e8  # finite


def test_arpa_roundtrip(tmp_path, lm):
    path = tmp_path / "lm.arpa"
    lm.save_arpa(path)
    lm2 = NGramLM.load_arpa(path)
    assert lm2.order == lm.order
    for sent in CORPUS + [["dog", "fish", "mat"], ["zzz"]]:
        assert lm2.score(sent) == pytest.approx(lm.score(sent), rel=1e-5)


def test_fusion_matrix_shape(lm):
    syms = ["<blk>", "cat", "dog", "the"]
    m = lm.fusion_matrix(syms, blank=0)
    assert m.shape == (5, 4)
    assert np.all(m[:, 0] == 0.0)                 # blank column unused
    # row 0 is the <s> context
    assert m[0, 3] == pytest.approx(lm.cond_logp("the", (BOS,)))
    # row i+1 conditions on sym_i
    assert m[3 + 1, 1] == pytest.approx(lm.cond_logp("cat", ("the",)))
    v = lm.eos_vector(syms)
    assert v.shape == (5,)
    assert v[1 + 1] == pytest.approx(lm.cond_logp(EOS, ("cat",)))


def _ambiguous_logp(T=6, C=4, prefer=2, margin=0.3):
    """Acoustics that clearly emit class 3 then weakly prefer `prefer`
    between classes 1 and 2."""
    lp = np.full((1, T, C), -8.0, np.float32)
    lp[0, :2, 3] = -0.1
    lp[0, 2:4, 0] = -0.1                           # blank gap
    lp[0, 4:, 1] = -1.0 - (margin if prefer == 2 else 0.0)
    lp[0, 4:, 2] = -1.0 - (margin if prefer == 1 else 0.0)
    return jnp.asarray(lp - np.log(np.sum(np.exp(lp), -1, keepdims=True)))


def test_fusion_flips_ambiguous_decision():
    # LM trained so that "c a" is likely and "c b" never occurs.
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"]] * 8 + [["b"]], order=2)
    bigram = lm.fusion_matrix(syms, blank=0)
    logp = _ambiguous_logp(prefer=2)               # acoustics prefer "b"
    lens = jnp.asarray([logp.shape[1]], jnp.int32)

    base = ctc_beam_search(logp, lens, BeamSearchConfig(beam_width=4))
    assert np.asarray(base["tokens"])[0, 0, :2].tolist() == [3, 2]  # "c b"

    cfg = BeamSearchConfig(beam_width=4, lm_weight=2.0)
    fused = ctc_beam_search(logp, lens, cfg, lm_bigram=bigram)
    assert np.asarray(fused["tokens"])[0, 0, :2].tolist() == [3, 1]  # "c a"
    # Score decomposition: total = am + w * lm.
    np.testing.assert_allclose(
        np.asarray(fused["scores"]),
        np.asarray(fused["am_scores"]) + 2.0 * np.asarray(fused["lm_scores"]),
        rtol=1e-5)


def test_zero_weight_fusion_is_noop():
    rng = np.random.default_rng(0)
    logp = jnp.asarray(rng.standard_normal((2, 12, 6)).astype(np.float32))
    logp = jnp.log(jnp.exp(logp) / jnp.sum(jnp.exp(logp), -1, keepdims=True))
    lens = jnp.asarray([12, 9], jnp.int32)
    cfg = BeamSearchConfig(beam_width=8)
    plain = ctc_beam_search(logp, lens, cfg)
    bigram = np.zeros((7, 6), np.float32)
    fused = ctc_beam_search(logp, lens, cfg, lm_bigram=bigram)
    np.testing.assert_array_equal(np.asarray(plain["tokens"]),
                                  np.asarray(fused["tokens"]))
    np.testing.assert_allclose(np.asarray(plain["scores"]),
                               np.asarray(fused["scores"]), rtol=1e-6)


def test_fusion_resumable_state_matches_full_pass():
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"], ["a", "b", "c"]] * 4, order=2)
    bigram = lm.fusion_matrix(syms, blank=0)
    rng = np.random.default_rng(1)
    logp = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))
    logp = jnp.log(jnp.exp(logp) / jnp.sum(jnp.exp(logp), -1, keepdims=True))
    cfg = BeamSearchConfig(beam_width=4, lm_weight=1.0)
    full = ctc_beam_search(logp, jnp.asarray([10], jnp.int32), cfg,
                           lm_bigram=bigram)
    first = ctc_beam_search(logp[:, :6], jnp.asarray([6], jnp.int32), cfg,
                            lm_bigram=bigram, return_state=True)
    second = ctc_beam_search(logp[:, 6:], jnp.asarray([4], jnp.int32), cfg,
                             lm_bigram=bigram, init_state=first["state"])
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(second["tokens"]))
    np.testing.assert_allclose(np.asarray(full["scores"]),
                               np.asarray(second["scores"]), rtol=1e-5)


def test_trigram_table_from_bigram_lm_equals_bigram_fusion():
    """An order-2 LM backs off identically from trigram contexts, so the
    (C+1,C+1,C) table must reproduce the bigram fusion results exactly."""
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"], ["a", "b", "c"], ["b", "a"]] * 3, order=2)
    rng = np.random.default_rng(5)
    logp = jnp.asarray(rng.standard_normal((2, 12, 4)).astype(np.float32))
    logp = jnp.log(jnp.exp(logp) / jnp.sum(jnp.exp(logp), -1, keepdims=True))
    lens = jnp.asarray([12, 9], jnp.int32)
    cfg = BeamSearchConfig(beam_width=4, lm_weight=0.8)
    a = ctc_beam_search(logp, lens, cfg, n_best=3,
                        lm_bigram=lm.fusion_matrix(syms),
                        lm_eos=lm.eos_vector(syms))
    b = ctc_beam_search(logp, lens, cfg, n_best=3,
                        lm_trigram=lm.fusion_tensor3(syms),
                        lm_eos=lm.eos_matrix(syms))
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))
    np.testing.assert_allclose(np.asarray(a["scores"]),
                               np.asarray(b["scores"]), rtol=1e-5)


def test_trigram_fusion_uses_two_back_context():
    """'a b ?' -> c and 'd b ?' -> e is invisible to a bigram (both
    contexts end in b) but decided by trigram fusion."""
    syms = ["<blk>", "a", "b", "c", "d", "e"]
    lm3 = train_ngram([["a", "b", "c"]] * 8 + [["d", "b", "e"]] * 8,
                      order=3)
    C, T = 6, 9

    def acoustics(first_tok):
        lp = np.full((1, T, C), -9.0, np.float32)
        lp[0, 0:2, first_tok] = -0.1
        lp[0, 2:3, 0] = -0.1
        lp[0, 3:5, 2] = -0.1                    # "b"
        lp[0, 5:6, 0] = -0.1
        lp[0, 6:, 3] = -1.25                    # "c" slightly worse...
        lp[0, 6:, 5] = -1.0                     # ...than "e" acoustically
        return jnp.asarray(lp - np.log(np.sum(np.exp(lp), -1,
                                              keepdims=True)))

    lens = jnp.asarray([T], jnp.int32)
    cfg = BeamSearchConfig(beam_width=6, lm_weight=2.0)
    tri = lm3.fusion_tensor3(syms)
    bi = lm3.fusion_matrix(syms)
    # After "a b": trigram demands "c" (overriding acoustics).
    out_a = ctc_beam_search(acoustics(1), lens, cfg, lm_trigram=tri)
    assert np.asarray(out_a["tokens"])[0, 0, :3].tolist() == [1, 2, 3]
    # After "d b": trigram demands "e".
    out_d = ctc_beam_search(acoustics(4), lens, cfg, lm_trigram=tri)
    assert np.asarray(out_d["tokens"])[0, 0, :3].tolist() == [4, 2, 5]
    # Bigram context (just "b") cannot separate them: picks the same
    # acoustically-favored token in both cases.
    ba = np.asarray(ctc_beam_search(acoustics(1), lens, cfg,
                                    lm_bigram=bi)["tokens"])[0, 0, 2]
    bd = np.asarray(ctc_beam_search(acoustics(4), lens, cfg,
                                    lm_bigram=bi)["tokens"])[0, 0, 2]
    assert ba == bd


def test_trigram_resumable_state_matches_full_pass():
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a", "b"], ["a", "b", "c"]] * 4, order=3)
    tri = lm.fusion_tensor3(syms)
    rng = np.random.default_rng(7)
    logp = jnp.asarray(rng.standard_normal((1, 10, 4)).astype(np.float32))
    logp = jnp.log(jnp.exp(logp) / jnp.sum(jnp.exp(logp), -1, keepdims=True))
    cfg = BeamSearchConfig(beam_width=4, lm_weight=1.0)
    full = ctc_beam_search(logp, jnp.asarray([10], jnp.int32), cfg,
                           lm_trigram=tri)
    first = ctc_beam_search(logp[:, :5], jnp.asarray([5], jnp.int32), cfg,
                            lm_trigram=tri, return_state=True)
    second = ctc_beam_search(logp[:, 5:], jnp.asarray([5], jnp.int32), cfg,
                             lm_trigram=tri, init_state=first["state"])
    np.testing.assert_array_equal(np.asarray(full["tokens"]),
                                  np.asarray(second["tokens"]))
    np.testing.assert_allclose(np.asarray(full["scores"]),
                               np.asarray(second["scores"]), rtol=1e-5)


def test_rescore_nbest_reorders():
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"]] * 10, order=2)
    tokens = np.full((1, 2, 4), -1, np.int32)
    tokens[0, 0, :2] = [3, 2]   # "c b" — acoustically best
    tokens[0, 1, :2] = [3, 1]   # "c a" — LM-best
    lens = np.asarray([[2, 2]])
    am = np.asarray([[-1.0, -1.2]])
    combined = rescore_nbest(lm, tokens, lens, am, syms, lm_weight=2.0)
    assert combined[0, 1] > combined[0, 0]
    # Weight 0 keeps acoustic order.
    plain = rescore_nbest(lm, tokens, lens, am, syms, lm_weight=0.0)
    assert plain[0, 0] > plain[0, 1]
