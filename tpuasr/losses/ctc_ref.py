"""Reference CTC loss: log-space alpha recursion via lax.scan, autodiff grad.

This is the parity/ground-truth implementation (oracles: torch.nn.CTCLoss,
optax.ctc_loss — see tests/test_ctc.py). The production path with the analytic
gradient lives in ctc_fb.py; the Pallas TPU kernel in ctc_pallas.py.

Shapes (fixed, padded):
  log_probs: (B, T, C) log-softmax over classes, blank = 0
  labels:    (B, U) int32, padded with anything (mask from label_lengths)
  input_lengths:  (B,) valid frames
  label_lengths:  (B,) valid labels
Returns per-utterance NLL (B,), with +inf mapped to 0 if zero_infinity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """(B, U) -> (B, S=2U+1) interleaved with blanks: [b, l1, b, l2, ..., b]."""
    B, U = labels.shape
    S = 2 * U + 1
    s = jnp.arange(S)
    lab_idx = jnp.maximum((s - 1) // 2, 0)
    ext = jnp.where(s % 2 == 1, labels[:, lab_idx], blank)
    return ext.astype(jnp.int32)


def _skip_mask(ext: jnp.ndarray, blank: int) -> jnp.ndarray:
    """allow[s]: transition s-2 -> s permitted (s odd label, differs from s-2)."""
    S = ext.shape[1]
    shifted = jnp.concatenate(
        [jnp.full((ext.shape[0], 2), -1, ext.dtype), ext[:, :-2]], axis=1)
    s = jnp.arange(S)[None, :]
    return (s % 2 == 1) & (s >= 2) & (ext != shifted)


def _gather_ext(lp, ext_g, C):
    """lp_ext[t, b, s] = lp[t, b, ext_g[b, s]] as a one-hot contraction.

    The obvious take_along_axis with a (T, B, S) index tensor lowers to a
    generic TPU gather that measured 16.6 ms at (T=250, B=128, S=49) —
    it was the ENTIRE hot cost of every CTC impl (VERDICT r3 next #8,
    train profile). As an MXU einsum against the (B, S, C) one-hot it is
    2.0 ms, and exactly one product term per output is nonzero.
    HIGHEST keeps f32-grade precision on backends that split f32 matmuls
    into bf16 passes.
    """
    onehot = jax.nn.one_hot(ext_g, C, dtype=lp.dtype)      # (B, S, C)
    return jnp.einsum("tbc,bsc->tbs", lp, onehot,
                      precision=jax.lax.Precision.HIGHEST)


def ctc_alphas(log_probs, labels, input_lengths, label_lengths, blank=0):
    """Runs the alpha recursion; returns (alphas (T,B,S), ll_per_t (T,B), aux).

    ll_per_t[t] = log P(labels | frames 0..t) — the loss for a sample with
    input_length t+1 is -ll_per_t[input_length-1].
    """
    B, T, C = log_probs.shape
    ext = _extend_labels(labels, blank)                    # (B, S)
    S = ext.shape[1]
    allow = _skip_mask(ext, blank)                         # (B, S)
    # Emissions gathered to extended-label positions: (T, B, S).
    # ext is clipped for the gather only — padded label slots may hold any
    # value; they are masked out via valid_s below.
    ext_g = jnp.clip(ext, 0, C - 1)
    lp = jnp.transpose(log_probs, (1, 0, 2))               # (T, B, C)
    lp_ext = _gather_ext(lp, ext_g, C)

    s_idx = jnp.arange(S)[None, :]
    # Positions beyond 2*label_len are unreachable.
    valid_s = s_idx <= 2 * label_lengths[:, None]

    init = jnp.where(s_idx < 2, lp_ext[0], NEG_INF)
    init = jnp.where(valid_s, init, NEG_INF)

    last = 2 * label_lengths                               # (B,)
    def ll_of(alpha):
        a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
        a_prev = jnp.take_along_axis(
            alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
        a_prev = jnp.where(label_lengths > 0, a_prev, NEG_INF)
        return jnp.logaddexp(a_last, a_prev)

    def step(alpha, lp_t):
        a0 = alpha
        a1 = jnp.concatenate([jnp.full((B, 1), NEG_INF), alpha[:, :-1]], 1)
        a2 = jnp.concatenate([jnp.full((B, 2), NEG_INF), alpha[:, :-2]], 1)
        a2 = jnp.where(allow, a2, NEG_INF)
        m = jnp.maximum(jnp.maximum(a0, a1), a2)
        m_safe = jnp.maximum(m, NEG_INF)
        new = m_safe + jnp.log(
            jnp.exp(a0 - m_safe) + jnp.exp(a1 - m_safe) + jnp.exp(a2 - m_safe))
        new = new + lp_t
        new = jnp.where(valid_s, new, NEG_INF)
        return new, (new, ll_of(new))

    _, (alphas_rest, ll_rest) = jax.lax.scan(step, init, lp_ext[1:])
    alphas = jnp.concatenate([init[None], alphas_rest], axis=0)    # (T, B, S)
    lls = jnp.concatenate([ll_of(init)[None], ll_rest], axis=0)    # (T, B)
    return alphas, lls, (ext, allow, lp_ext, valid_s)


def ctc_loss_ref(log_probs, labels, input_lengths, label_lengths,
                 blank: int = 0, zero_infinity: bool = True) -> jnp.ndarray:
    """Per-utterance CTC NLL; differentiable by autodiff through the scan."""
    _, lls, _ = ctc_alphas(log_probs, labels, input_lengths, label_lengths,
                           blank)
    T = log_probs.shape[1]
    t_idx = jnp.clip(input_lengths - 1, 0, T - 1)
    ll = jnp.take_along_axis(lls, t_idx[None, :], axis=0)[0]       # (B,)
    loss = -ll
    if zero_infinity:
        loss = jnp.where(loss >= -NEG_INF * 0.5, 0.0, loss)
    return loss
