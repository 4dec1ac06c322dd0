"""OpenFst-interop WFST: text format round-trip, exact shortest-path
scoring, transduction, and n-best rescoring with a hard-constraint grammar
an ARPA n-gram cannot express (VERDICT r2 item 6 done-check)."""

import math

import numpy as np
import pytest

from tpuasr.decode import (SymbolTable, WFST, lexicon_to_fst,
                           rescore_nbest_fst)


def linear_fst(labels, weights=None, final_w=0.0):
    fst = WFST(start=0)
    weights = weights or [0.0] * len(labels)
    for i, (lab, w) in enumerate(zip(labels, weights)):
        fst.add_arc(i, i + 1, lab, lab, w)
    fst.set_final(len(labels), final_w)
    return fst


def test_linear_scoring():
    fst = linear_fst([1, 2, 3], [0.5, 0.25, 0.125], final_w=1.0)
    cost, outs = fst.score([1, 2, 3])
    assert cost == pytest.approx(0.5 + 0.25 + 0.125 + 1.0)
    assert outs == [1, 2, 3]
    assert not fst.accepts([1, 2])        # must consume to a final state
    assert not fst.accepts([1, 3, 2])
    assert not fst.accepts([1, 2, 3, 3])


def test_epsilon_closure_and_min_path():
    # Two paths for input [5]: direct cost 2.0, or eps-hop (0.3) + 1.0.
    fst = WFST(start=0)
    fst.add_arc(0, 3, 5, 7, 2.0)
    fst.add_arc(0, 1, 0, 9, 0.3)          # input-eps, emits 9
    fst.add_arc(1, 3, 5, 7, 1.0)
    fst.set_final(3)
    cost, outs = fst.score([5])
    assert cost == pytest.approx(1.3)
    assert outs == [9, 7]                 # eps path chosen, both olabels


def test_eps_cycle_terminates():
    fst = WFST(start=0)
    fst.add_arc(0, 1, 0, 0, 0.1)
    fst.add_arc(1, 0, 0, 0, 0.1)          # eps cycle, positive cost
    fst.add_arc(0, 2, 4, 4, 1.0)
    fst.set_final(2)
    cost, _ = fst.score([4])
    assert cost == pytest.approx(1.0)


def test_text_roundtrip(tmp_path):
    fst = WFST(start=0)
    fst.add_arc(0, 1, 1, 2, 0.5)
    fst.add_arc(1, 2, 3, 0, 0.25)
    fst.add_arc(1, 1, 2, 2, 0.125)
    fst.set_final(2, 0.75)
    p = tmp_path / "g.txt"
    fst.save_text(p)
    fst2 = WFST.load_text(p)
    for seq in ([1, 3], [1, 2, 3], [1, 2, 2, 3], [3]):
        a, ao = fst.score(seq)
        b, bo = fst2.score(seq)
        assert (a == b or (math.isinf(a) and math.isinf(b))) and ao == bo


def test_text_roundtrip_final_only_start(tmp_path):
    # The start state has no arcs: its final line must come FIRST in the
    # text file (first mentioned state defines the start), or a reload
    # silently picks a different start state.
    fst = WFST(start=5)
    fst.set_final(5, 0.25)
    fst.add_arc(1, 5, 2, 0, 0.5)   # unreachable from start, but present
    p = tmp_path / "g.txt"
    fst.save_text(p)
    fst2 = WFST.load_text(p)
    assert fst2.start == 5
    assert fst2.score([])[0] == pytest.approx(0.25)
    assert math.isinf(fst2.score([2])[0])


def test_text_with_symbol_tables(tmp_path):
    phones = SymbolTable.from_list(["<eps>", "p1", "p2"])
    words = SymbolTable.from_list(["<eps>", "hello"])
    p = tmp_path / "l.txt"
    p.write_text("0 1 p1 <eps> 0.5\n1 0 p2 hello\n0\n")
    fst = WFST.load_text(p, isyms=phones, osyms=words)
    cost, outs = fst.score([1, 2])
    assert cost == pytest.approx(0.5)
    assert outs == [words["hello"]]


def test_lexicon_fst_transduces_words():
    prons = [("go", (1, 2)), ("stop", (3, 4, 5)), ("a", (6,))]
    fst = lexicon_to_fst(prons)
    cost, outs = fst.score([1, 2, 3, 4, 5, 6])
    assert cost == pytest.approx(0.0)
    assert outs == [1, 2, 3]              # 1-based word ids: go stop a
    cost2, outs2 = fst.score([6, 6, 1, 2])
    assert outs2 == [3, 3, 1]
    assert not fst.accepts([1, 3])        # no word boundary match


def test_nbest_rescore_hard_constraint_beats_arpa():
    """A grammar with a HARD global constraint — 'word B must appear
    exactly once' — that no fixed-order ARPA can encode. The FST flips the
    ranking to the constraint-satisfying hypothesis; an ARPA trained on
    text where both bigrams are common does not."""
    # Words: A=1, B=2 over phones a=1, b=2. Grammar G states: 0 = no B yet
    # (non-final), 1 = exactly one B (final); more than one B rejected.
    tlg = WFST(start=0)
    for st in (0, 1):
        tlg.add_arc(st, st, 1, 1, 0.1)     # word A anywhere
    tlg.add_arc(0, 1, 2, 2, 0.1)           # first B
    tlg.set_final(1)
    # Hypotheses (phone ids): hyp0 = A A (violates: no B), better AM;
    # hyp1 = A B, slightly worse AM.
    tokens = np.array([[[1, 1, 0], [1, 2, 0]]], np.int32)
    lens = np.array([[2, 2]], np.int32)
    am = np.array([[-1.0, -1.5]], np.float64)
    scores, outs = rescore_nbest_fst(tlg, tokens, lens, am, fst_weight=1.0)
    assert scores[0, 1] > scores[0, 0]     # FST flips the ranking
    assert outs[0][1] == [1, 2]
    # The ARPA analog: bigrams (A,A) and (A,B) both frequent -> rescoring
    # keeps the higher-AM hypothesis; the global constraint is invisible.
    from tpuasr.lm import train_ngram
    from tpuasr.lm.ngram import rescore_nbest
    texts = [["A", "A", "B"], ["A", "B", "A"], ["B", "A", "A"]] * 5
    lm = train_ngram(texts, order=2)
    arpa = rescore_nbest(lm, tokens, lens, am, ["<blank>", "A", "B"],
                         lm_weight=1.0)
    assert arpa[0, 0] > arpa[0, 1]         # ARPA cannot see the constraint


def test_rejected_hyps_rank_by_am():
    fst = linear_fst([1])
    tokens = np.array([[[2, 0], [3, 0]]], np.int32)
    lens = np.array([[1, 1]], np.int32)
    am = np.array([[-1.0, -2.0]], np.float64)
    scores, _ = rescore_nbest_fst(fst, tokens, lens, am)
    assert scores[0, 0] > scores[0, 1]     # both rejected: AM order kept
    assert scores[0, 0] < -1e8             # but visibly penalized
