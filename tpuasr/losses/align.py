"""CTC forced alignment: Viterbi best path over the extended-label lattice.

The reference's Kaldi latgen decode returned ``(words, alignments)`` — the
frame-level state sequence alongside the transcript (SURVEY.md section 3.4:
``decoder.decode(loglikes, len) -> (word_ids, alignment)``). This module is
the TPU-native equivalent: given AM log-probs and a (forced) label sequence,
run max-product dynamic programming over the same blank-interleaved lattice
the CTC loss uses (tpuasr.losses.ctc_ref), backtrack on device, and emit

* the per-frame extended-state path,
* the per-frame label ids (blank where the path sits on a blank state),
* per-token frame spans ``[start, end)`` — the user-facing timestamps,
* the Viterbi path log-probability.

Everything is fixed-shape and jit-safe: the forward pass stores int8
backpointers (0 = stay, 1 = from s-1, 2 = from s-2) and the backtrack is a
reversed ``lax.scan`` that re-anchors each batch row at its own final frame,
so ragged ``input_lengths`` need no host loop.

Shapes (fixed, padded) — identical to the loss entry points:
  log_probs: (B, T, C) log-softmax over classes, blank = 0
  labels:    (B, U) int32
  input_lengths / label_lengths: (B,)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuasr.losses.ctc_ref import NEG_INF, _extend_labels, _skip_mask


def ctc_align(log_probs, labels, input_lengths, label_lengths,
              blank: int = 0):
    """Force-align ``labels`` onto ``log_probs``; returns a dict of arrays.

    Keys:
      frame_states: (B, T) int32 extended-lattice state per frame
        (even = blank slot, odd s = label (s-1)//2); -1 past input_length.
      frame_labels: (B, T) int32 class id per frame (``blank`` on blank
        states); -1 past input_length.
      token_starts / token_ends: (B, U) int32 frame spans [start, end) of
        each label token; -1 past label_length or if infeasible.
      scores: (B,) float32 Viterbi path log-probability (NEG_INF-ish when
        the alignment is infeasible, e.g. input too short for the labels).
      feasible: (B,) bool.
    """
    B, T, C = log_probs.shape
    U = labels.shape[1]
    ext = _extend_labels(labels, blank)                     # (B, S)
    S = ext.shape[1]
    allow = _skip_mask(ext, blank)                          # (B, S)
    ext_g = jnp.clip(ext, 0, C - 1)
    lp = jnp.transpose(log_probs, (1, 0, 2))                # (T, B, C)
    from tpuasr.losses.ctc_ref import _gather_ext
    lp_ext = _gather_ext(lp, ext_g, C)     # one-hot MXU einsum, not gather

    s_idx = jnp.arange(S)[None, :]
    valid_s = s_idx <= 2 * label_lengths[:, None]

    init = jnp.where(s_idx < 2, lp_ext[0], NEG_INF)
    init = jnp.where(valid_s, init, NEG_INF)

    last = 2 * label_lengths                                # (B,)
    last_m1 = jnp.maximum(last - 1, 0)

    def end_pair(delta):
        """(value at s=2L, value at s=2L-1) — the two legal end states."""
        a_last = jnp.take_along_axis(delta, last[:, None], axis=1)[:, 0]
        a_prev = jnp.take_along_axis(delta, last_m1[:, None], axis=1)[:, 0]
        a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
        return a_last, a_prev

    def fwd(carry, xs):
        delta, cap_last, cap_prev = carry
        t, lp_t = xs
        a0 = delta
        a1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), delta[:, :-1]], 1)
        a2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), delta[:, :-2]], 1)
        a2 = jnp.where(allow, a2, NEG_INF)
        stacked = jnp.stack([a0, a1, a2])                   # (3, B, S)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        new = jnp.max(stacked, axis=0) + lp_t
        new = jnp.where(valid_s, new, NEG_INF)
        # Capture the end-state values at each row's own final frame.
        el, ep = end_pair(new)
        at_end = t == input_lengths - 1
        cap_last = jnp.where(at_end, el, cap_last)
        cap_prev = jnp.where(at_end, ep, cap_prev)
        return (new, cap_last, cap_prev), choice

    el0, ep0 = end_pair(init)
    at0 = input_lengths - 1 == 0
    cap0 = (jnp.where(at0, el0, NEG_INF), jnp.where(at0, ep0, NEG_INF))
    ts = jnp.arange(1, T)
    (_, cap_last, cap_prev), choices = jax.lax.scan(
        fwd, (init, *cap0), (ts, lp_ext[1:]))
    # choices[t-1] holds the backpointer for the transition (t-1) -> t;
    # pad index 0 so ch_full[t] always refers to how frame t was reached.
    ch_full = jnp.concatenate(
        [jnp.zeros((1, B, S), jnp.int8), choices], axis=0)  # (T, B, S)

    scores = jnp.maximum(cap_last, cap_prev)
    feasible = scores > NEG_INF * 0.5
    end_state = jnp.where((cap_last >= cap_prev) | (label_lengths == 0),
                          last, last_m1).astype(jnp.int32)

    def back(s_carry, xs):
        t, ch_t = xs
        s = jnp.where(t == input_lengths - 1, end_state, s_carry)
        step = jnp.take_along_axis(ch_t, s[:, None], axis=1)[:, 0]
        return (s - step).astype(jnp.int32), s

    _, path_rev = jax.lax.scan(
        back, end_state, (jnp.arange(T)[::-1], ch_full[::-1]))
    path = jnp.transpose(path_rev[::-1])                    # (B, T)
    frame_valid = (jnp.arange(T)[None, :] < input_lengths[:, None]) \
        & feasible[:, None]
    frame_states = jnp.where(frame_valid, path, -1)

    lab_at = jnp.take_along_axis(ext, jnp.clip(path, 0, S - 1), axis=1)
    frame_labels = jnp.where(path % 2 == 1, lab_at, blank)
    frame_labels = jnp.where(frame_valid, frame_labels, -1)

    # Token u occupies extended state 2u+1; its span is the contiguous run
    # of frames the Viterbi path spends there.
    tok_states = 2 * jnp.arange(U) + 1                      # (U,)
    match = frame_states[:, :, None] == tok_states[None, None, :]
    t_col = jnp.arange(T)[None, :, None]
    starts = jnp.min(jnp.where(match, t_col, T), axis=1)
    ends = jnp.max(jnp.where(match, t_col + 1, 0), axis=1)
    tok_valid = (jnp.arange(U)[None, :] < label_lengths[:, None]) \
        & feasible[:, None]
    token_starts = jnp.where(tok_valid, starts, -1).astype(jnp.int32)
    token_ends = jnp.where(tok_valid, ends, -1).astype(jnp.int32)

    return {
        "frame_states": frame_states.astype(jnp.int32),
        "frame_labels": frame_labels.astype(jnp.int32),
        "token_starts": token_starts,
        "token_ends": token_ends,
        "scores": scores,
        "feasible": feasible,
    }
