"""CTC forced alignment (tpuasr.losses.align) vs brute-force DP.

The reference's latgen decode returned (words, alignments) (SURVEY.md
section 3.4); ctc_align is the TPU-native replacement. Oracle here is an
exhaustive enumeration of every legal path through the blank-interleaved
lattice on tiny problems — the Viterbi score must equal the max-path score
and the returned path must itself be a legal path achieving it.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.losses import ctc_align, ctc_loss_ref
from tpuasr.losses.ctc_ref import NEG_INF


def _extend(labels, blank=0):
    ext = [blank]
    for l in labels:
        ext += [int(l), blank]
    return ext


def _legal_paths(T, labels, blank=0):
    """Yield every state path of length T through the extended lattice."""
    ext = _extend(labels, blank)
    S = len(ext)
    ends = {S - 1, S - 2} if len(labels) else {0}

    def rec(t, s, acc):
        if t == T:
            if s in ends:
                yield list(acc)
            return
        nxt = [s, s + 1]
        if s + 2 < S and s % 2 == 0 and ext[s + 2] != ext[s]:
            # from a blank state we may skip to the next label unless equal
            pass
        if s + 2 < S and (s + 2) % 2 == 1 and ext[s + 2] != ext[s]:
            nxt.append(s + 2)
        for n in nxt:
            if n < S:
                acc.append(n)
                yield from rec(t + 1, n, acc)
                acc.pop()

    for s0 in (0, 1) if len(labels) else (0,):
        if s0 < S:
            yield from rec(1, s0, [s0])


def _brute_best(log_probs, labels, blank=0):
    """(T, C) log-probs, labels list -> (best score, best path) or None."""
    ext = _extend(labels, blank)
    best, best_path = -np.inf, None
    for path in _legal_paths(log_probs.shape[0], labels, blank):
        score = sum(log_probs[t, ext[s]] for t, s in enumerate(path))
        if score > best:
            best, best_path = score, path
    return best, best_path


def _rand_logp(rng, T, C):
    x = rng.normal(size=(T, C)).astype(np.float32)
    return np.asarray(jax.nn.log_softmax(jnp.asarray(x), axis=-1))


@pytest.mark.parametrize("T,C,labels", [
    (4, 3, [1, 2]),
    (5, 4, [2, 2]),          # repeated label forces a blank between
    pytest.param(6, 4, [1, 2, 3], marks=pytest.mark.slow),
    pytest.param(3, 3, [1], marks=pytest.mark.slow),
    pytest.param(6, 5, [4, 1, 4], marks=pytest.mark.slow),
])
def test_viterbi_matches_bruteforce(rng, T, C, labels):
    lp = _rand_logp(rng, T, C)
    U = len(labels)
    out = ctc_align(jnp.asarray(lp)[None], jnp.asarray([labels]),
                    jnp.asarray([T]), jnp.asarray([U]))
    best, best_path = _brute_best(lp, labels)
    assert bool(out["feasible"][0])
    np.testing.assert_allclose(float(out["scores"][0]), best, rtol=1e-5)
    # The returned path must be legal and achieve the same score.
    path = np.asarray(out["frame_states"][0, :T])
    ext = _extend(labels)
    score = sum(lp[t, ext[s]] for t, s in enumerate(path))
    np.testing.assert_allclose(score, best, rtol=1e-5)
    legal = {tuple(p) for p in _legal_paths(T, labels)}
    assert tuple(int(s) for s in path) in legal


def test_path_collapses_to_labels(rng):
    B, T, C, U = 4, 12, 6, 4
    lp = np.stack([_rand_logp(rng, T, C) for _ in range(B)])
    labels = rng.integers(1, C, size=(B, U)).astype(np.int32)
    lab_lens = np.array([4, 2, 3, 1], np.int32)
    in_lens = np.array([12, 9, 11, 7], np.int32)
    out = jax.jit(ctc_align)(jnp.asarray(lp), jnp.asarray(labels),
                             jnp.asarray(in_lens), jnp.asarray(lab_lens))
    fl = np.asarray(out["frame_labels"])
    for b in range(B):
        assert bool(out["feasible"][b])
        seq = fl[b, :in_lens[b]]
        # collapse: odd states emit their label once per contiguous run
        toks, prev_state = [], -99
        states = np.asarray(out["frame_states"][b, :in_lens[b]])
        for s, l in zip(states, seq):
            if s % 2 == 1 and s != prev_state:
                toks.append(int(l))
            prev_state = s
        assert toks == list(labels[b, :lab_lens[b]])
        # past input_length everything is -1
        assert (fl[b, in_lens[b]:] == -1).all()


def test_token_spans_consistent(rng):
    B, T, C, U = 3, 10, 5, 3
    lp = np.stack([_rand_logp(rng, T, C) for _ in range(B)])
    labels = rng.integers(1, C, size=(B, U)).astype(np.int32)
    lab_lens = np.array([3, 2, 3], np.int32)
    in_lens = np.array([10, 8, 10], np.int32)
    out = ctc_align(jnp.asarray(lp), jnp.asarray(labels),
                    jnp.asarray(in_lens), jnp.asarray(lab_lens))
    st, en = np.asarray(out["token_starts"]), np.asarray(out["token_ends"])
    states = np.asarray(out["frame_states"])
    for b in range(B):
        prev_end = 0
        for u in range(lab_lens[b]):
            assert 0 <= st[b, u] < en[b, u] <= in_lens[b]
            assert st[b, u] >= prev_end  # spans ordered, non-overlapping
            prev_end = en[b, u]
            span = states[b, st[b, u]:en[b, u]]
            assert (span == 2 * u + 1).all()
        assert (st[b, lab_lens[b]:] == -1).all()
        assert (en[b, lab_lens[b]:] == -1).all()


def test_score_bounded_by_ctc_loss(rng):
    """Viterbi (max over paths) <= logsumexp over paths (= -CTC loss)."""
    B, T, C, U = 5, 14, 7, 5
    lp = np.stack([_rand_logp(rng, T, C) for _ in range(B)])
    labels = rng.integers(1, C, size=(B, U)).astype(np.int32)
    lab_lens = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    in_lens = np.full((B,), T, np.int32)
    out = ctc_align(jnp.asarray(lp), jnp.asarray(labels),
                    jnp.asarray(in_lens), jnp.asarray(lab_lens))
    nll = ctc_loss_ref(jnp.asarray(lp), jnp.asarray(labels),
                       jnp.asarray(in_lens), jnp.asarray(lab_lens))
    assert (np.asarray(out["scores"]) <= -np.asarray(nll) + 1e-4).all()


def test_infeasible_and_empty():
    T, C = 3, 4
    lp = np.asarray(jax.nn.log_softmax(jnp.zeros((2, T, C)), axis=-1))
    # row 0: labels [1,1] need >= 3 frames (1, blank, 1) but input_len=2
    # row 1: empty label sequence -> all-blank path, feasible
    labels = np.array([[1, 1], [0, 0]], np.int32)
    out = ctc_align(jnp.asarray(lp), jnp.asarray(labels),
                    jnp.asarray([2, 3]), jnp.asarray([2, 0]))
    assert not bool(out["feasible"][0])
    assert (np.asarray(out["token_starts"][0]) == -1).all()
    assert float(out["scores"][0]) <= NEG_INF * 0.5
    assert bool(out["feasible"][1])
    states = np.asarray(out["frame_states"][1, :3])
    assert (states == 0).all()  # all-blank
    np.testing.assert_allclose(float(out["scores"][1]),
                               float(lp[1, :3, 0].sum()), rtol=1e-5)
