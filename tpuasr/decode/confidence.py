"""Hypothesis confidence scoring for CTC decodes.

The reference's Kaldi latgen path exposed lattice posteriors that downstream
tooling turned into word confidences (SURVEY.md §3.4's decoder returned
scored lattices); the greedy path had nothing. This module is the rebuild's
confidence surface, computed on device from quantities the pipeline already
produces — no second pass over the audio:

* ``beam_posterior`` — for beam decodes: the probability mass of the top
  hypothesis *within the searched set*, ``exp(score_0 - logsumexp(scores))``.
  Beam scores are genuine log p(prefix | X) totals (the search merges
  duplicate prefixes by logsumexp), so this is the n-best posterior the
  latgen lattice would give, restricted to the beam.

* ``align_confidence`` — for any decode (greedy included): force-align the
  hypothesis back onto the AM posteriors (``tpuasr.losses.ctc_align``) and
  report, per token, the arithmetic-mean posterior of that token's class
  over its aligned frame span, plus a per-utterance score
  ``exp(viterbi_score / num_frames)`` — the per-frame geometric mean of the
  Viterbi path posterior (well-defined even for empty hypotheses, where the
  path is all blanks).

Everything is fixed-shape and jit-safe; padded tokens report 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuasr.losses.align import ctc_align


def beam_posterior(scores: jnp.ndarray) -> jnp.ndarray:
    """Posterior mass of each hypothesis within its beam.

    Args:
      scores: (B, K) total log-probabilities of the K beam hypotheses
        (sorted or not — the normalization is per row).
    Returns:
      (B, K) posteriors in [0, 1] summing to 1 per row.
    """
    return jnp.exp(scores - jax.scipy.special.logsumexp(
        scores, axis=-1, keepdims=True))


def align_confidence(log_probs, tokens, token_lens, input_lengths,
                     blank: int = 0):
    """Token- and utterance-level confidence via CTC forced alignment.

    Args:
      log_probs: (B, T, C) AM log-softmax outputs, blank = ``blank``.
      tokens: (B, U) int32 hypothesis token ids (the decode output).
      token_lens: (B,) int32 valid token counts.
      input_lengths: (B,) int32 valid frame counts.
    Returns dict:
      token_conf: (B, U) float32 in [0, 1] — mean posterior of token u's
        class over its aligned frame span; 0 past ``token_lens`` or when
        the alignment is infeasible.
      utt_conf: (B,) float32 — exp(viterbi_score / input_length), the
        per-frame geometric-mean path posterior; 0 when infeasible.
      token_starts / token_ends: (B, U) int32 frame spans (from ctc_align).
      feasible: (B,) bool.
    """
    B, T, C = log_probs.shape
    U = tokens.shape[1]
    tokens = tokens.astype(jnp.int32)
    al = ctc_align(log_probs, tokens, input_lengths, token_lens, blank=blank)
    st, en = al["token_starts"], al["token_ends"]          # (B, U)

    # Per-token class posterior track: (B, T, U) = posteriors of token u's
    # class at every frame, then mean over the aligned span [st, en).
    tok_g = jnp.clip(tokens, 0, C - 1)
    post_u = jnp.exp(jnp.take_along_axis(
        log_probs, tok_g[:, None, :].repeat(T, 1), axis=2))  # (B, T, U)
    t_idx = jnp.arange(T, dtype=jnp.int32)[None, :, None]    # (1, T, 1)
    span = ((t_idx >= st[:, None, :]) & (t_idx < en[:, None, :])
            & (t_idx < input_lengths[:, None, None]))        # (B, T, U)
    n = jnp.maximum(span.sum(axis=1), 1)                     # (B, U)
    token_conf = (post_u * span).sum(axis=1) / n
    u_valid = (jnp.arange(U)[None, :] < token_lens[:, None]) & (st >= 0)
    token_conf = jnp.where(u_valid & al["feasible"][:, None],
                           token_conf, 0.0)

    frames = jnp.maximum(input_lengths, 1).astype(log_probs.dtype)
    utt_conf = jnp.where(al["feasible"],
                         jnp.exp(al["scores"] / frames), 0.0)
    return {"token_conf": token_conf, "utt_conf": utt_conf,
            "token_starts": st, "token_ends": en,
            "feasible": al["feasible"]}
