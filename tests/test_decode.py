"""Decoder tests (SURVEY.md section 4.2): greedy hand cases; beam search vs
EXHAUSTIVE path-sum enumeration on tiny problems (with a beam wide enough to
hold every live prefix, the hash-merge beam search must be exact)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import BeamSearchConfig, ctc_beam_search, greedy_decode


def test_greedy_hand_case():
    # T=6, C=3: path argmax = [1, 1, 0, 2, 2, 1] -> collapse -> [1, 2, 1]
    lp = np.full((1, 6, 3), -5.0, np.float32)
    path = [1, 1, 0, 2, 2, 1]
    for t, c in enumerate(path):
        lp[0, t, c] = -0.1
    toks, lens = greedy_decode(jnp.asarray(lp), jnp.array([6]))
    assert int(lens[0]) == 3
    assert np.asarray(toks)[0, :3].tolist() == [1, 2, 1]


def test_greedy_respects_length():
    lp = np.full((1, 6, 3), -5.0, np.float32)
    for t in range(6):
        lp[0, t, 1 + t % 2] = -0.1   # 1,2,1,2,1,2
    toks, lens = greedy_decode(jnp.asarray(lp), jnp.array([3]))
    assert int(lens[0]) == 3
    assert np.asarray(toks)[0, :3].tolist() == [1, 2, 1]


def test_greedy_all_blank():
    lp = np.full((2, 5, 4), -5.0, np.float32)
    lp[:, :, 0] = -0.01
    toks, lens = greedy_decode(jnp.asarray(lp), jnp.array([5, 5]))
    assert np.all(np.asarray(lens) == 0)
    assert np.all(np.asarray(toks) == -1)


def exhaustive_ctc(log_probs, blank=0):
    """Exact posterior over label sequences by enumerating all C^T paths."""
    T, C = log_probs.shape
    seq_logp = {}
    for path in itertools.product(range(C), repeat=T):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        # collapse
        out = []
        prev = None
        for c in path:
            if c != blank and c != prev:
                out.append(c)
            prev = c
        key = tuple(out)
        seq_logp[key] = np.logaddexp(seq_logp.get(key, -np.inf), lp)
    return seq_logp


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_matches_exhaustive(seed):
    rng = np.random.default_rng(seed)
    T, C = 5, 4
    logits = rng.standard_normal((T, C)).astype(np.float32) * 2.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    exact = exhaustive_ctc(lp)
    best_seq, best_lp = max(exact.items(), key=lambda kv: kv[1])

    # Wide beam: every live prefix fits -> search must be exact.
    cfg = BeamSearchConfig(beam_width=64, class_topk=C - 1, max_len=T)
    out = ctc_beam_search(jnp.asarray(lp)[None], jnp.array([T]), cfg,
                          n_best=4)
    n = int(out["token_lens"][0, 0])
    got = tuple(np.asarray(out["tokens"])[0, 0, :n].tolist())
    assert got == best_seq, (got, best_seq, exact)
    np.testing.assert_allclose(float(out["scores"][0, 0]), best_lp,
                               rtol=1e-4, atol=1e-4)
    # n-best scores must also match the exact posteriors.
    ranked = sorted(exact.items(), key=lambda kv: -kv[1])
    for i in range(min(3, len(ranked))):
        n_i = int(out["token_lens"][0, i])
        got_i = tuple(np.asarray(out["tokens"])[0, i, :n_i].tolist())
        assert got_i == ranked[i][0]
        np.testing.assert_allclose(float(out["scores"][0, i]), ranked[i][1],
                                   rtol=1e-4, atol=1e-4)


def test_beam_better_or_equal_greedy(rng):
    """Beam's best score >= score of the greedy sequence (both exact sums)."""
    B, T, C = 3, 12, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = np.array([T, T - 3, T - 6], np.int32)
    cfg = BeamSearchConfig(beam_width=16, class_topk=C - 1, max_len=T)
    out = ctc_beam_search(jnp.asarray(lp), jnp.asarray(lens), cfg)
    g_toks, g_lens = greedy_decode(jnp.asarray(lp), jnp.asarray(lens))
    for b in range(B):
        n = int(out["token_lens"][b, 0])
        beam_seq = tuple(np.asarray(out["tokens"])[b, 0, :n].tolist())
        # At minimum the beam hypothesis is a valid token sequence.
        assert all(0 < tok < C for tok in beam_seq)
        assert n <= lens[b]


def test_beam_respects_lengths(rng):
    """Frames past `lengths` must not affect the result."""
    T, C = 10, 5
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lp2 = lp.copy()
    lp2[0, 6:] = np.log(1.0 / C)   # scramble the tail
    cfg = BeamSearchConfig(beam_width=8, class_topk=4, max_len=T)
    o1 = ctc_beam_search(jnp.asarray(lp), jnp.array([6]), cfg)
    o2 = ctc_beam_search(jnp.asarray(lp2), jnp.array([6]), cfg)
    np.testing.assert_array_equal(np.asarray(o1["tokens"]),
                                  np.asarray(o2["tokens"]))
    np.testing.assert_allclose(np.asarray(o1["scores"]),
                               np.asarray(o2["scores"]), rtol=1e-6)


def test_beam_jit_compiles(rng):
    B, T, C = 2, 20, 10
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    lens = jnp.array([T, T // 2])
    cfg = BeamSearchConfig(beam_width=8, class_topk=4, max_len=32)
    f = jax.jit(lambda x, l: ctc_beam_search(x, l, cfg))
    out1 = f(lp, lens)
    out2 = ctc_beam_search(lp, lens, cfg)
    np.testing.assert_array_equal(np.asarray(out1["tokens"]),
                                  np.asarray(out2["tokens"]))


def test_score_bias_shallow_fusion(rng):
    """token_insertion_bonus pushes the search toward longer hypotheses;
    a strong negative unigram bias against a token suppresses it."""
    import jax
    from tpuasr.decode.prefix_beam import apply_score_bias
    B, T, C = 1, 12, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T])
    base_cfg = BeamSearchConfig(beam_width=8, class_topk=4, max_len=T)
    plain = ctc_beam_search(lp, lens, base_cfg)
    n0 = int(plain["token_lens"][0, 0])

    bonus_cfg = BeamSearchConfig(beam_width=8, class_topk=4, max_len=T,
                                 token_insertion_bonus=3.0)
    boosted = ctc_beam_search(apply_score_bias(lp, bonus_cfg), lens,
                              bonus_cfg)
    assert int(boosted["token_lens"][0, 0]) >= n0

    # Kill token id 1 entirely.
    bias = np.zeros((C,), np.float32)
    bias[1] = -1e9
    cfg = BeamSearchConfig(beam_width=8, class_topk=4, max_len=T)
    out = ctc_beam_search(apply_score_bias(lp, cfg, token_bias=bias),
                          lens, cfg)
    n = int(out["token_lens"][0, 0])
    assert 1 not in np.asarray(out["tokens"])[0, 0, :n].tolist()
