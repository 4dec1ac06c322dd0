"""Pruned determinization at BENCH scale (VERDICT r4 next #8).

bench.py compiles a ~58k-state LG (200-word lexicon over a 64-class
inventory composed with a word bigram) with prune=10, quantum=0.1. These
tests pin that graph's state growth, verify the pruned tables' cost
contract (score drift bounded by quantum/2 per consumed symbol) against
the original graph, and assert the max_states failure mode surfaces a
usable error both from the library and from the CLI helper."""

import numpy as np
import pytest

from tpuasr.decode import (compile_graph_tables, compose, lexicon_to_fst,
                           ngram_to_fst)
from tpuasr.decode.fst import INF
from tpuasr.lm import train_ngram

NUM_CLASSES = 64


def _bench_graph():
    """The EXACT graph bench.py builds (same seed/sizes; bench.py:167)."""
    grng = np.random.default_rng(7)
    prons, seen = [], set()
    while len(prons) < 200:
        p = tuple(int(v) for v in
                  grng.integers(1, NUM_CLASSES,
                                size=int(grng.integers(2, 5))))
        if p not in seen:
            seen.add(p)
            prons.append((f"w{len(prons):03d}", p))
    sents = [[f"w{int(v):03d}" for v in
              grng.integers(0, len(prons),
                            size=int(grng.integers(3, 9)))]
             for _ in range(400)]
    lg = compose(lexicon_to_fst(prons),
                 ngram_to_fst(train_ngram(sents, order=2),
                              {w: i + 1 for i, (w, _) in
                               enumerate(prons)}))
    return prons, lg


def _walk_tables(tabs, tokens):
    """Cost of ``tokens`` through the dense tables (INF if rejected)."""
    s, cost = tabs.start, 0.0
    for t in tokens:
        ns = int(tabs.next_state[s, t])
        if ns < 0:
            return INF
        cost += float(tabs.cost[s, t])
        s = ns
    f = float(tabs.final[s])
    return INF if f >= 1e29 else cost + f


@pytest.mark.slow
class TestBenchScaleGraph:
    @pytest.fixture(scope="class")
    def graph(self):
        prons, lg = _bench_graph()
        tabs = compile_graph_tables(lg, NUM_CLASSES, max_states=400_000,
                                    prune=10.0, quantum=0.1)
        return prons, lg, tabs

    def test_state_growth_pinned(self, graph):
        """Pruned determinization must stay in the measured band: BENCH_r04
        recorded 58,272 states for this graph. A regression in the subset
        keying (e.g. residual quantization off) shows up as runaway
        growth toward max_states; an over-aggressive prune collapses it."""
        _, lg, tabs = graph
        assert 20_000 < tabs.num_states < 120_000, tabs.num_states
        # and the composed source graph is the size bench measured against
        assert lg.num_states > 1_000

    def test_replay_exactness_on_sampled_sentences(self, graph):
        """For in-grammar phone strings (sampled sentences through the
        lexicon) the table walk must match the original LG's min-cost
        parse within the documented drift bound: quantum/2 per consumed
        symbol (+ float slack). This is the contract that lets the tables
        STEER the search while exact scores come from replay."""
        prons, lg, tabs = graph
        rng = np.random.default_rng(3)
        checked = 0
        for _ in range(40):
            n_words = int(rng.integers(1, 5))
            toks = []
            for _ in range(n_words):
                toks.extend(prons[int(rng.integers(0, len(prons)))][1])
            ref_cost, _ = lg.score(toks)
            got = _walk_tables(tabs, toks)
            if ref_cost == INF:
                # a pruned path may legitimately vanish only if it was
                # > prune from the in-subset best; rejection of an
                # accepted string is allowed ONLY in that case — but the
                # reverse (accepting a rejected string) never is.
                assert got == INF
                continue
            assert got < INF, "tables rejected an in-grammar sentence"
            bound = 0.05 * len(toks) + 1e-3     # quantum/2 per symbol
            assert abs(got - ref_cost) <= bound, (got, ref_cost, len(toks))
            checked += 1
        assert checked >= 30    # the contract was actually exercised

    def test_out_of_grammar_rejected(self, graph):
        """Strings no lexicon path can spell must be rejected by the
        tables exactly as by the graph."""
        prons, lg, tabs = graph
        rng = np.random.default_rng(5)
        rejected = 0
        for _ in range(20):
            toks = [int(v) for v in
                    rng.integers(1, NUM_CLASSES, size=6)]
            ref_cost, _ = lg.score(toks)
            if ref_cost == INF:
                assert _walk_tables(tabs, toks) == INF
                rejected += 1
        assert rejected >= 10   # random strings are mostly out-of-grammar


class TestMaxStatesErrorSurface:
    def test_library_error_is_actionable(self):
        prons, lg = _bench_graph()
        with pytest.raises(ValueError, match="max_states"):
            compile_graph_tables(lg, NUM_CLASSES, max_states=500,
                                 prune=10.0, quantum=0.1)

    def test_cli_error_is_actionable(self, tmp_path):
        """build_decode_graph must convert the blow-up into a SystemExit
        whose message names the knobs users can turn."""
        import argparse

        from tpuasr.cli.common import build_decode_graph
        from tpuasr.decode import SymbolTable
        prons, lg = _bench_graph()
        fst_path = tmp_path / "lg.fst"
        lg.save_binary(fst_path)
        args = argparse.Namespace(
            fst=str(fst_path), fst_isyms=None, fst_osyms=None,
            graph_prune=10.0, graph_quantum=0.1, graph_max_states=500,
            lexicon=None, words=None, lm=None)
        with pytest.raises(SystemExit) as ei:
            build_decode_graph(args, NUM_CLASSES, [])
        msg = str(ei.value)
        assert "--graph-max-states" in msg and "--graph-quantum" in msg
        assert "--fst-decode" in msg
