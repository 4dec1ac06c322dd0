"""Confidence scoring (tpuasr.decode.confidence).

The reference's latgen lattices carried posteriors downstream tooling used
as confidences (SURVEY.md section 3.4); this is the rebuild's equivalent.
Properties pinned here:

* beam_posterior is a proper per-row posterior (sums to 1, order-preserving
  with scores, near-1 when one hypothesis dominates).
* align_confidence: near-1 token/utterance confidence on peaked posteriors,
  strictly lower on flattened ones; padded tokens report 0; infeasible
  alignments report 0; ragged batches match per-row singleton calls; the
  empty hypothesis gets the all-blank path confidence.
* jit-compatibility (the CLI jits align_confidence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import align_confidence, beam_posterior


def _peaked_logp(T, C, labels, peak=12.0, blank=0):
    """Log-softmax frames tracing blank,l1,blank,l2,... strongly."""
    seq = []
    for l in labels:
        seq += [blank, int(l)]
    seq += [blank]
    # One pass through the label sequence, then blanks to T (repeating the
    # pattern would contradict a single-pass alignment on trailing frames).
    frame_classes = (seq + [blank] * T)[:T]
    logits = np.zeros((T, C), np.float32)
    logits[np.arange(T), frame_classes] = peak
    return jax.nn.log_softmax(jnp.asarray(logits), axis=-1), frame_classes


class TestBeamPosterior:
    def test_normalized_and_ordered(self):
        scores = jnp.asarray([[-1.0, -2.0, -5.0], [-0.1, -9.0, -9.0]])
        p = np.asarray(beam_posterior(scores))
        np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-6)
        assert (np.diff(p, axis=1) <= 1e-9).all()  # sorted scores -> sorted p
        assert p[1, 0] > 0.99  # dominant hypothesis -> near-1 posterior

    def test_invariant_to_shift(self):
        s = jnp.asarray([[-3.0, -4.0, -4.5]])
        p1 = np.asarray(beam_posterior(s))
        p2 = np.asarray(beam_posterior(s + 7.25))
        np.testing.assert_allclose(p1, p2, rtol=1e-6)


class TestAlignConfidence:
    def test_peaked_posteriors_high_confidence(self):
        T, C = 24, 6
        labels = [2, 3, 1]
        lp, _ = _peaked_logp(T, C, labels)
        out = align_confidence(lp[None], jnp.asarray([labels], jnp.int32),
                               jnp.asarray([len(labels)]),
                               jnp.asarray([T]))
        assert bool(out["feasible"][0])
        tc = np.asarray(out["token_conf"][0, :len(labels)])
        assert (tc > 0.95).all(), tc
        assert float(out["utt_conf"][0]) > 0.95

    def test_flat_posteriors_lower_confidence(self):
        T, C = 24, 6
        labels = [2, 3, 1]
        lp_sharp, _ = _peaked_logp(T, C, labels, peak=12.0)
        lp_soft, _ = _peaked_logp(T, C, labels, peak=1.0)
        args = (jnp.asarray([labels], jnp.int32),
                jnp.asarray([len(labels)]), jnp.asarray([T]))
        hi = align_confidence(lp_sharp[None], *args)
        lo = align_confidence(lp_soft[None], *args)
        assert float(lo["utt_conf"][0]) < float(hi["utt_conf"][0])
        assert (np.asarray(lo["token_conf"][0, :3])
                < np.asarray(hi["token_conf"][0, :3])).all()
        # Both are probabilities.
        for out in (hi, lo):
            assert (np.asarray(out["token_conf"]) <= 1.0 + 1e-6).all()
            assert float(out["utt_conf"][0]) <= 1.0 + 1e-6

    def test_padding_and_ragged_batch_match_singletons(self):
        T, C = 20, 5
        rng = np.random.default_rng(0)
        lp_full = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32)),
            axis=-1)
        labels = np.zeros((2, 3), np.int32)
        labels[0, :2] = [1, 2]
        labels[1, :3] = [3, 1, 4]
        lab_lens = np.asarray([2, 3], np.int32)
        in_lens = np.asarray([12, 20], np.int32)
        batched = align_confidence(lp_full, jnp.asarray(labels),
                                   jnp.asarray(lab_lens),
                                   jnp.asarray(in_lens))
        for b in range(2):
            solo = align_confidence(
                lp_full[b:b + 1], jnp.asarray(labels[b:b + 1]),
                jnp.asarray(lab_lens[b:b + 1]), jnp.asarray(in_lens[b:b + 1]))
            np.testing.assert_allclose(
                np.asarray(batched["utt_conf"][b]),
                np.asarray(solo["utt_conf"][0]), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(batched["token_conf"][b]),
                np.asarray(solo["token_conf"][0]), rtol=1e-5)
        # Padded token slots report exactly 0.
        assert float(batched["token_conf"][0, 2]) == 0.0

    def test_infeasible_reports_zero(self):
        # 2 frames cannot carry 3 labels -> infeasible.
        T, C = 2, 5
        lp = jax.nn.log_softmax(jnp.zeros((1, T, C)), axis=-1)
        out = align_confidence(lp, jnp.asarray([[1, 2, 3]], jnp.int32),
                               jnp.asarray([3]), jnp.asarray([T]))
        assert not bool(out["feasible"][0])
        assert float(out["utt_conf"][0]) == 0.0
        assert (np.asarray(out["token_conf"]) == 0.0).all()

    def test_empty_hypothesis_blank_path(self):
        T, C = 10, 4
        # Strong blank everywhere: empty hyp should be near-1 confident.
        logits = np.zeros((T, C), np.float32)
        logits[:, 0] = 10.0
        lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)[None]
        out = align_confidence(lp, jnp.zeros((1, 1), jnp.int32),
                               jnp.asarray([0]), jnp.asarray([T]))
        assert bool(out["feasible"][0])
        assert float(out["utt_conf"][0]) > 0.95
        assert (np.asarray(out["token_conf"]) == 0.0).all()

    def test_jit(self):
        T, C = 16, 5
        lp, _ = _peaked_logp(T, C, [1, 2])
        f = jax.jit(align_confidence)
        out = f(lp[None], jnp.asarray([[1, 2]], jnp.int32),
                jnp.asarray([2]), jnp.asarray([T]))
        assert float(out["utt_conf"][0]) > 0.9
