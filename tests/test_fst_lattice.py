"""Lattice-generating WFST decode (tpuasr.decode.fst_decode n-best API).

The reference's decoder was Kaldi's *lattice*-faster decoder (SURVEY.md
section 2.1 latgen row / 3.4); beyond the best path (test_fst_decode.py),
this pins the lattice surface backed by native/wfst_lattice.cc:

* n-best is EXACT vs exhaustive enumeration of every frame label path
  grouped by word sequence (unpruned: huge beam + lattice beam),
* hypothesis 0 == the Viterbi decoder's best path (words, frames, score),
* the C++ engine == the pure-Python mirror, bit-for-bit, incl. threads,
* word confidences are true posteriors: exact vs enumeration on graphs
  where every complete path emits one word; probability axioms hold
  everywhere,
* the pruned-lattice dump conserves posterior mass (source outflow = 1)
  and survives the Kaldi-style text round trip.
"""

import io
import itertools

import numpy as np
import pytest

from tpuasr.decode.fst import WFST, lexicon_to_fst
from tpuasr.decode.fst_decode import (lattice_available, wfst_ctc_decode,
                                      wfst_ctc_decode_nbest,
                                      wfst_ctc_lattice, write_lattice_text)

IMPLS = ["py"] + (["native"] if lattice_available() else [])


def _rand_logp(rng, T, C, peak=None, scale=1.0):
    logits = rng.standard_normal((T, C)).astype(np.float32) * scale
    if peak is not None:
        logits[np.arange(T), peak] += 8.0
    x = logits - logits.max(-1, keepdims=True)
    return (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)


def _all_parses(fst, seq):
    """EVERY accepting graph path for a phone sequence, as
    [(graph_cost, words)] — unlike WFST.score, which keeps only the best
    parse; the lattice legitimately contains all of them (e.g. words
    [3, 2] and [1, 2] can spell the same phones)."""
    out = []

    def walk(state, pos, cost, words, depth):
        if depth > 50:   # eps-cycle guard (test graphs have none)
            return
        if pos == len(seq):
            fw = fst.finals.get(state)
            if fw is not None and np.isfinite(fw):
                out.append((cost + fw, list(words)))
        for a in fst.arcs.get(state, ()):
            w2 = words + [a.olabel] if a.olabel else words
            if a.ilabel == 0:
                walk(a.dst, pos, cost + a.weight, w2, depth + 1)
            elif pos < len(seq) and a.ilabel == seq[pos]:
                walk(a.dst, pos + 1, cost + a.weight, w2, 0)

    walk(fst.start, 0, 0.0, [], 0)
    return out


def _exhaustive_groups(fst, lp):
    """All (frame label path x graph parse) combinations grouped by
    emitted word sequence: {words: (min_cost, total_log_mass)} — the gold
    standard for n-best ranking AND for sequence posteriors."""
    T, C = lp.shape
    groups: dict = {}
    for path in itertools.product(range(C), repeat=T):
        ac = -sum(float(lp[t, path[t]]) for t in range(T))
        collapsed, last = [], 0
        for y in path:
            if y != 0 and y != last:
                collapsed.append(y)
            last = y
        for g, outs in _all_parses(fst, collapsed):
            cost = ac + g
            key = tuple(outs)
            best, mass = groups.get(key, (np.inf, -np.inf))
            groups[key] = (min(best, cost), np.logaddexp(mass, -cost))
    return groups


def _two_word_graph():
    fst = WFST(start=0)
    fst.add_arc(0, 1, 1, 10, 0.5)
    fst.add_arc(0, 2, 2, 20, 0.7)
    fst.set_final(1, 0.0)
    fst.set_final(2, 0.0)
    return fst


def _loop_graph():
    # words can repeat: richer n-best structure than the two-word graph
    fst = WFST(start=0)
    fst.set_final(0)
    fst.add_arc(0, 1, 1, 0, 0.0)
    fst.add_arc(1, 0, 2, 1, 0.11)   # phones (1,2) -> word 1
    fst.add_arc(0, 2, 2, 0, 0.0)
    fst.add_arc(2, 0, 1, 2, 0.23)   # phones (2,1) -> word 2
    fst.add_arc(0, 0, 1, 3, 0.37)   # phone (1)    -> word 3
    return fst


@pytest.mark.parametrize("impl", IMPLS)
class TestNBestExact:
    def test_matches_exhaustive_ranking(self, impl):
        fst = _loop_graph()
        for seed in range(3):
            lp = _rand_logp(np.random.default_rng(seed), T=5, C=3, scale=2.0)
            gold = sorted(((c, list(k)) for k, (c, _) in
                           _exhaustive_groups(fst, lp).items()))
            out = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([5]),
                                        nbest=6, beam=1e9, max_active=0,
                                        lat_beam=1e9, impl=impl)
            n = int(out["nhyp"][0])
            assert n == min(6, len(gold))
            for i in range(n):
                np.testing.assert_allclose(-out["scores"][0, i], gold[i][0],
                                           rtol=1e-5)
                L = int(out["word_lens"][0, i])
                assert out["words"][0, i, :L].tolist() == gold[i][1]
            # scores nonincreasing, no duplicate word sequences
            s = out["scores"][0, :n]
            assert np.all(np.diff(s) <= 1e-6)
            seqs = [tuple(out["words"][0, i, :int(out["word_lens"][0, i])])
                    for i in range(n)]
            assert len(set(seqs)) == n

    def test_hyp0_is_viterbi_best_path(self, impl):
        fst = _loop_graph()
        for seed in range(3):
            rng = np.random.default_rng(100 + seed)
            lp = _rand_logp(rng, T=7, C=3, scale=1.5)
            best = wfst_ctc_decode(fst, lp[None], np.asarray([7]), beam=1e9,
                                   max_active=0, impl=impl)
            nb = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([7]),
                                       nbest=4, beam=1e9, max_active=0,
                                       lat_beam=1e9, impl=impl)
            np.testing.assert_allclose(nb["scores"][0, 0], best["scores"][0],
                                       rtol=1e-5)
            L = int(best["word_lens"][0])
            assert (nb["words"][0, 0, :L].tolist()
                    == best["words"][0, :L].tolist())
            assert (nb["frames"][0, 0, :L].tolist()
                    == best["frames"][0, :L].tolist())
            assert nb["reached_final"][0] == best["reached_final"][0]

    def test_confidence_is_sequence_posterior(self, impl):
        # On a graph where every complete path emits exactly one word,
        # the time-anchored word posterior IS the sequence posterior.
        fst = _two_word_graph()
        lp = np.zeros((1, 4, 3), np.float32)
        lp[0, :, 0] = np.log(0.5)
        lp[0, :, 1] = np.log(0.35)
        lp[0, :, 2] = np.log(0.15)
        groups = _exhaustive_groups(fst, lp[0])
        total = np.logaddexp.reduce([m for _, m in groups.values()])
        out = wfst_ctc_decode_nbest(fst, lp, np.asarray([4]), nbest=2,
                                    beam=1e9, max_active=0, lat_beam=1e9,
                                    impl=impl)
        w0 = int(out["words"][0, 0, 0])
        gold_post = np.exp(groups[(w0,)][1] - total)
        np.testing.assert_allclose(out["confidences"][0, 0], gold_post,
                                   rtol=1e-4)

    def test_confidence_axioms(self, impl):
        fst = _loop_graph()
        lp = _rand_logp(np.random.default_rng(7), T=6, C=3, scale=1.0)
        out = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([6]), nbest=3,
                                    beam=1e9, max_active=0, lat_beam=1e9,
                                    impl=impl)
        L = int(out["word_lens"][0, 0])
        conf = out["confidences"][0, :L]
        assert np.all(conf > 0.0) and np.all(conf <= 1.0)
        # padding stays zero
        assert np.all(out["confidences"][0, L:] == 0.0)

    def test_partial_hypothesis_fallback(self, impl):
        # No final state reachable: latgen-faster partial semantics, and
        # the n-best must still produce hypotheses.
        fst = lexicon_to_fst([("aa", (1, 1))])
        lp = _rand_logp(np.random.default_rng(3), T=3, C=2, peak=[1, 1, 1])
        out = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([3]), beam=4.0,
                                    nbest=2, impl=impl)
        assert not bool(out["reached_final"][0])
        assert int(out["nhyp"][0]) >= 1

    def test_empty_input(self, impl):
        fst = _two_word_graph()
        lp = np.zeros((1, 3, 3), np.float32)
        out = wfst_ctc_decode_nbest(fst, lp, np.asarray([0]), nbest=2,
                                    impl=impl)
        # zero frames: no word can be emitted; the (empty) hypothesis is
        # partial because neither word-final state was reached
        assert int(out["word_lens"][0, 0]) == 0
        assert int(out["nhyp"][0]) >= 1


@pytest.mark.skipif(not lattice_available(), reason="native lib unbuilt")
class TestNativeVsPython:
    def test_random_graphs_agree(self):
        rng = np.random.default_rng(11)
        for seed in range(4):
            fst = WFST(start=0)
            S, C = 5, 4
            for _ in range(12):
                fst.add_arc(int(rng.integers(S)), int(rng.integers(S)),
                            int(rng.integers(1, C)), int(rng.integers(0, 6)),
                            float(rng.uniform(0, 2)))
            fst.set_final(int(rng.integers(S)), float(rng.uniform(0, 1)))
            lp = _rand_logp(np.random.default_rng(seed), T=6, C=C)
            kw = dict(nbest=4, beam=1e9, max_active=0, lat_beam=8.0)
            a = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([6]),
                                      impl="native", **kw)
            b = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([6]),
                                      impl="py", **kw)
            assert a["nhyp"][0] == b["nhyp"][0]
            np.testing.assert_array_equal(a["words"], b["words"])
            np.testing.assert_array_equal(a["frames"], b["frames"])
            np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5)
            np.testing.assert_allclose(a["confidences"], b["confidences"],
                                       rtol=1e-4, atol=1e-6)

    def test_pruned_still_agree(self):
        fst = _loop_graph()
        lp = _rand_logp(np.random.default_rng(5), T=8, C=3, scale=2.0)
        kw = dict(nbest=5, beam=5.0, max_active=4, lat_beam=3.0)
        a = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([8]),
                                  impl="native", **kw)
        b = wfst_ctc_decode_nbest(fst, lp[None], np.asarray([8]),
                                  impl="py", **kw)
        assert a["nhyp"][0] == b["nhyp"][0]
        np.testing.assert_array_equal(a["words"], b["words"])
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5)

    def test_threads_deterministic(self):
        fst = _loop_graph()
        rng = np.random.default_rng(9)
        B = 8
        lp = np.stack([_rand_logp(rng, T=6, C=3) for _ in range(B)])
        lens = np.full(B, 6, np.int32)
        a = wfst_ctc_decode_nbest(fst, lp, lens, nbest=3, num_threads=1)
        b = wfst_ctc_decode_nbest(fst, lp, lens, nbest=3, num_threads=4)
        for k in ("words", "frames", "word_lens", "nhyp"):
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_array_equal(a["scores"], b["scores"])
        np.testing.assert_array_equal(a["confidences"], b["confidences"])

    def test_ragged_batch_matches_singletons(self):
        fst = _loop_graph()
        rng = np.random.default_rng(13)
        T = 7
        lens = np.asarray([7, 4, 1], np.int32)
        lp = np.stack([_rand_logp(rng, T=T, C=3) for _ in range(3)])
        batch = wfst_ctc_decode_nbest(fst, lp, lens, nbest=3)
        for b in range(3):
            one = wfst_ctc_decode_nbest(fst, lp[b:b + 1, :int(lens[b])],
                                        lens[b:b + 1], nbest=3)
            np.testing.assert_array_equal(batch["words"][b], one["words"][0])
            np.testing.assert_allclose(batch["scores"][b], one["scores"][0],
                                       rtol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
class TestLatticeDump:
    def test_source_outflow_is_one(self, impl):
        # every complete path crosses exactly one source-outgoing link, so
        # their posteriors must sum to 1 (log-semiring FB sanity)
        fst = _loop_graph()
        lp = _rand_logp(np.random.default_rng(21), T=5, C=3)
        lat = wfst_ctc_lattice(fst, lp, beam=1e9, max_active=0,
                               lat_beam=1e9, impl=impl)
        mass = lat["post"][lat["src"] == 0].sum()
        np.testing.assert_allclose(mass, 1.0, rtol=1e-4)
        # sink inflow likewise
        sink = int(np.nonzero(lat["node_state"] == -1)[0][0])
        np.testing.assert_allclose(lat["post"][lat["dst"] == sink].sum(),
                                   1.0, rtol=1e-4)

    def test_best_cost_matches_decode(self, impl):
        fst = _loop_graph()
        lp = _rand_logp(np.random.default_rng(22), T=6, C=3)
        lat = wfst_ctc_lattice(fst, lp, beam=1e9, max_active=0, impl=impl)
        best = wfst_ctc_decode(fst, lp[None], np.asarray([6]), beam=1e9,
                               max_active=0, impl="py")
        np.testing.assert_allclose(lat["best_cost"], -best["scores"][0],
                                   rtol=1e-5)
        assert lat["reached_final"] == bool(best["reached_final"][0])

    def test_text_export_structure(self, impl):
        fst = _two_word_graph()
        lp = np.zeros((4, 3), np.float32) + np.log(1 / 3)
        lat = wfst_ctc_lattice(fst, lp, beam=1e9, max_active=0, impl=impl)
        buf = io.StringIO()
        write_lattice_text(buf, "utt1", lat)
        lines = buf.getvalue().strip().splitlines()
        assert lines[0] == "utt1"
        arcs = [ln for ln in lines[1:] if len(ln.split()) == 4]
        finals = [ln for ln in lines[1:] if len(ln.split()) == 2]
        assert arcs and finals
        # arc lines parse as src dst word g,a, ; all ids within range
        N = len(lat["node_frame"])
        for ln in arcs:
            s, d, w, cost = ln.split()
            assert 0 <= int(s) < N and 0 <= int(d) < N
            g, a, _ = cost.split(",")
            float(g), float(a)

@pytest.mark.skipif(not lattice_available(), reason="native lib unbuilt")
class TestDumpParity:
    def test_native_matches_py_dump(self):
        fst = _loop_graph()
        lp = _rand_logp(np.random.default_rng(23), T=5, C=3)
        a = wfst_ctc_lattice(fst, lp, beam=1e9, max_active=0, lat_beam=6.0,
                             impl="native")
        b = wfst_ctc_lattice(fst, lp, beam=1e9, max_active=0, lat_beam=6.0,
                             impl="py")
        assert len(a["src"]) == len(b["src"])
        np.testing.assert_allclose(np.sort(a["post"]), np.sort(b["post"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(a["best_cost"], b["best_cost"],
                                   rtol=1e-6)
