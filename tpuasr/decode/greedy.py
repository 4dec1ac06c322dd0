"""Greedy CTC decode: argmax -> collapse repeats -> strip blanks.

Fixed-shape and jit-safe: the compaction scatter writes dropped positions to a
sacrificial column instead of using dynamic sizes. Runs on device for whole
batches (reference did this per-utterance on host, SURVEY.md section 3.2).
"""

from __future__ import annotations

import jax.numpy as jnp


def greedy_decode(log_probs, lengths, blank: int = 0, pad_id: int = -1):
    """(B, T, C) log-probs, (B,) lengths -> (tokens (B, T), token_lens (B,)).

    tokens is left-compacted and padded with ``pad_id``.
    """
    B, T, _ = log_probs.shape
    ids = jnp.argmax(log_probs, axis=-1)                       # (B, T)
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), blank, ids.dtype), ids[:, :-1]], axis=1)
    keep = (ids != blank) & (ids != prev) & valid
    pos = jnp.cumsum(keep, axis=1) - 1                         # target slot
    pos = jnp.where(keep, pos, T)                              # dropped -> col T
    out = jnp.full((B, T + 1), pad_id, ids.dtype)
    out = out.at[jnp.arange(B)[:, None], pos].set(ids)
    token_lens = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out[:, :T], token_lens
