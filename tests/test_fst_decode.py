"""First-pass WFST CTC decoding (tpuasr.decode.fst_decode).

The reference decoded by walking TLG.fst with Kaldi latgen (SURVEY.md
section 3.4); this pins the rebuild's host decoder:

* exact vs exhaustive enumeration of every frame-label path on tiny
  problems (the composed-Viterbi gold standard, via WFST.score),
* the C++ native decoder == the pure-Python oracle on random graphs,
* graph constraints actually drive the search (a grammar the AM dislikes
  still wins; rescoring-only pipelines cannot do this),
* CTC semantics: repeated-phone prons need an intervening blank,
* latgen-faster edge behavior (no final state reached -> partial),
* ragged batches match singleton calls; binary round-trip graphs decode.
"""

import itertools

import numpy as np
import pytest

from tpuasr.decode.fst import WFST, lexicon_to_fst
from tpuasr.decode.fst_decode import (available, flatten_fst,
                                      wfst_ctc_decode)

IMPLS = ["py"] + (["native"] if available() else [])


def _rand_logp(rng, T, C, peak=None, scale=1.0):
    """Random normalized log-probs; optionally peaked on a class track."""
    logits = rng.standard_normal((T, C)).astype(np.float32) * scale
    if peak is not None:
        logits[np.arange(T), peak] += 8.0
    x = logits - logits.max(-1, keepdims=True)
    return (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)


def _exhaustive_best(fst, lp):
    """Gold standard: min over ALL frame label paths of acoustic cost +
    WFST.score of the collapsed sequence (incl. finals)."""
    T, C = lp.shape
    best, words = np.inf, []
    for path in itertools.product(range(C), repeat=T):
        ac = -sum(float(lp[t, path[t]]) for t in range(T))
        collapsed, last = [], 0
        for y in path:
            if y != 0 and y != last:
                collapsed.append(y)
            last = y
        g, outs = fst.score(collapsed)
        if ac + g < best:
            best, words = ac + g, outs
    return best, words


@pytest.mark.parametrize("impl", IMPLS)
class TestExact:
    def test_matches_exhaustive(self, impl):
        # Distinct word costs so every parse of a phone sequence has a
        # unique total (zero-cost lexicons tie "ab a" with "a ba" and the
        # argmin words become implementation-defined).
        fst = WFST(start=0)
        fst.set_final(0)
        fst.add_arc(0, 1, 1, 0, 0.0)
        fst.add_arc(1, 0, 2, 1, 0.11)   # "ab" -> word 1
        fst.add_arc(0, 2, 2, 0, 0.0)
        fst.add_arc(2, 0, 1, 2, 0.23)   # "ba" -> word 2
        fst.add_arc(0, 0, 1, 3, 0.37)   # "a"  -> word 3
        for seed in range(4):
            lp = _rand_logp(np.random.default_rng(seed), T=5, C=3, scale=2.0)
            gold_cost, gold_words = _exhaustive_best(fst, lp)
            out = wfst_ctc_decode(fst, lp[None], np.asarray([5]),
                                  beam=1e9, max_active=0, impl=impl)
            assert bool(out["reached_final"][0])
            np.testing.assert_allclose(-out["scores"][0], gold_cost,
                                       rtol=1e-5)
            n = int(out["word_lens"][0])
            assert out["words"][0, :n].tolist() == gold_words

    def test_graph_weights_break_ties(self, impl):
        # Two words with the same pronunciation cost apart: the cheaper
        # word must win regardless of AM (pure graph decision).
        fst = WFST(start=0)
        fst.set_final(0)
        fst.add_arc(0, 0, 1, 1, 3.0)   # word 1, cost 3
        fst.add_arc(0, 0, 1, 2, 0.5)   # word 2, cost 0.5
        lp = _rand_logp(np.random.default_rng(1), T=4, C=2, peak=[1, 0, 0, 0])
        out = wfst_ctc_decode(fst, lp[None], np.asarray([4]), impl=impl)
        assert out["words"][0, :int(out["word_lens"][0])].tolist() == [2]

    def test_grammar_constraint_beats_am(self, impl):
        # AM screams phone 2, but the graph only accepts phone 1: the
        # decode must return the grammar's word — the capability n-best
        # rescoring cannot provide when the beam never kept phone 1.
        fst = lexicon_to_fst([("one", (1,))])
        lp = _rand_logp(np.random.default_rng(2), T=6, C=3,
                        peak=[0, 2, 2, 2, 0, 0])
        out = wfst_ctc_decode(fst, lp[None], np.asarray([6]), impl=impl)
        assert bool(out["reached_final"][0])
        assert out["words"][0, :int(out["word_lens"][0])].tolist() == [1]

    def test_repeated_phone_needs_blank(self, impl):
        # Pron (1, 1): frames "1 blank 1" spell it; "1 1 1" collapses to a
        # single phone and cannot reach a final state.
        fst = lexicon_to_fst([("aa", (1, 1))])
        ok = _rand_logp(np.random.default_rng(3), T=3, C=2, peak=[1, 0, 1])
        bad = _rand_logp(np.random.default_rng(4), T=3, C=2, peak=[1, 1, 1])
        # Tight beam: with a wide one, a low-probability "1 blank 1" frame
        # path legitimately survives and reaches final even on `bad`.
        o1 = wfst_ctc_decode(fst, ok[None], np.asarray([3]), beam=4.0,
                             impl=impl)
        o2 = wfst_ctc_decode(fst, bad[None], np.asarray([3]), beam=4.0,
                             impl=impl)
        assert bool(o1["reached_final"][0])
        assert o1["words"][0, :int(o1["word_lens"][0])].tolist() == [1]
        assert not bool(o2["reached_final"][0])  # partial (latgen semantics)

    def test_empty_input(self, impl):
        fst = lexicon_to_fst([("w", (1,))])  # state 0 is final
        lp = np.zeros((1, 4, 2), np.float32)
        out = wfst_ctc_decode(fst, lp, np.asarray([0]), impl=impl)
        assert bool(out["reached_final"][0])
        assert int(out["word_lens"][0]) == 0
        assert float(out["scores"][0]) == 0.0

    def test_word_frames_monotone(self, impl):
        fst = lexicon_to_fst([("ab", (1, 2)), ("c", (3,))])
        lp = _rand_logp(np.random.default_rng(5), T=10, C=4,
                        peak=[1, 2, 0, 3, 0, 1, 2, 0, 3, 0])
        out = wfst_ctc_decode(fst, lp[None], np.asarray([10]), impl=impl)
        n = int(out["word_lens"][0])
        assert n >= 2
        fr = out["frames"][0, :n]
        assert (np.diff(fr) >= 0).all() and (fr >= 0).all()


def _random_fst(rng, n_states=8, n_arcs=30, C=6, n_words=5,
                eps_frac=0.2) -> WFST:
    fst = WFST(start=0)
    for _ in range(n_arcs):
        src, dst = int(rng.integers(n_states)), int(rng.integers(n_states))
        eps = rng.random() < eps_frac
        il = 0 if eps else int(rng.integers(1, C))
        ol = int(rng.integers(0, n_words + 1))
        w = float(rng.random() * 2.0) if not eps else float(rng.random())
        fst.add_arc(src, dst, il, ol, w)
    for s in rng.choice(n_states, size=3, replace=False):
        fst.set_final(int(s), float(rng.random()))
    return fst


@pytest.mark.skipif(not available(), reason="native lib unavailable")
class TestNativeVsPython:
    def test_random_graphs_agree(self):
        rng = np.random.default_rng(7)
        for seed in range(6):
            fst = _random_fst(np.random.default_rng(100 + seed))
            lp = _rand_logp(rng, T=20, C=6, scale=2.0)
            kw = dict(beam=1e9, max_active=0)
            a = wfst_ctc_decode(fst, lp[None], np.asarray([20]),
                                impl="native", **kw)
            b = wfst_ctc_decode(fst, lp[None], np.asarray([20]),
                                impl="py", **kw)
            assert bool(a["reached_final"][0]) == bool(b["reached_final"][0])
            np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-4)
            na, nb = int(a["word_lens"][0]), int(b["word_lens"][0])
            # Costs are exact-equal targets; word sequences can differ only
            # on exact ties, which random float weights make measure-zero.
            assert a["words"][0, :na].tolist() == b["words"][0, :nb].tolist()

    def test_pruned_still_agree(self):
        # Same beam/max_active => same deterministic pruning decisions.
        rng = np.random.default_rng(8)
        fst = _random_fst(np.random.default_rng(42), n_states=12, n_arcs=60)
        lp = _rand_logp(rng, T=30, C=6)
        kw = dict(beam=8.0, max_active=16)
        a = wfst_ctc_decode(fst, lp[None], np.asarray([30]),
                            impl="native", **kw)
        b = wfst_ctc_decode(fst, lp[None], np.asarray([30]), impl="py", **kw)
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-4)

    def test_ragged_batch_matches_singletons(self):
        rng = np.random.default_rng(9)
        fst = lexicon_to_fst([("ab", (1, 2)), ("ba", (2, 1)), ("a", (1,))])
        B, T, C = 3, 12, 3
        lp = np.stack([_rand_logp(rng, T, C) for _ in range(B)])
        lens = np.asarray([12, 7, 1], np.int32)
        batched = wfst_ctc_decode(fst, lp, lens, impl="native")
        for b in range(B):
            solo = wfst_ctc_decode(fst, lp[b:b + 1], lens[b:b + 1],
                                   impl="native")
            np.testing.assert_allclose(batched["scores"][b],
                                       solo["scores"][0], rtol=1e-5)
            n = int(batched["word_lens"][b])
            assert n == int(solo["word_lens"][0])
            assert (batched["words"][b, :n] == solo["words"][0, :n]).all()


class TestFlattenAndIO:
    def test_flatten_csr(self):
        fst = lexicon_to_fst([("ab", (1, 2))])
        flat = flatten_fst(fst)
        assert flat.arc_off[-1] == len(flat.ilabels)
        assert flatten_fst(fst) is flat  # cached

    def test_binary_roundtrip_decodes(self, tmp_path):
        fst = lexicon_to_fst([("ab", (1, 2)), ("c", (3,))])
        p = tmp_path / "tlg.fst"
        fst.save_binary(p)
        loaded = WFST.load(p)
        lp = _rand_logp(np.random.default_rng(11), T=6, C=4,
                        peak=[1, 2, 0, 3, 0, 0])
        a = wfst_ctc_decode(fst, lp[None], np.asarray([6]), impl="py")
        b = wfst_ctc_decode(loaded, lp[None], np.asarray([6]), impl="py")
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-6)
        assert (a["words"] == b["words"]).all()
