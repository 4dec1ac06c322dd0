"""CTC with analytic gradient: alpha-beta forward-backward, custom_vjp.

Replaces warp-ctc's fused forward-backward (reference: external Baidu warp-ctc
C++/CUDA library, SURVEY.md section 2.2). The backward pass is the textbook
result: with beta_t(s) defined to EXCLUDE the emission at t,

    d loss / d log_probs[t, c] = -exp( logsumexp_{s: ext[s]=c}
                                       (alpha_t(s) + beta_t(s)) - logZ )

so the class scatter is a (S -> C) one-hot matmul — MXU work, not scatter ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuasr.losses.ctc_ref import (NEG_INF, _extend_labels, _skip_mask,
                                   ctc_alphas)


def _logsumexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))


def ctc_betas(lp_ext, allow, valid_s, input_lengths, label_lengths):
    """Reverse recursion. beta_t(s) = log P(emissions t+1.. | state s at t).

    lp_ext: (T, B, S) emissions gathered at extended labels.
    Returns betas (T, B, S).
    """
    T, B, S = lp_ext.shape
    s_idx = jnp.arange(S)[None, :]
    last = 2 * label_lengths                                # (B,)
    # Init at t = len-1: 0 at the two final states, -inf elsewhere.
    init_ok = (s_idx == last[:, None]) | (
        (s_idx == (last - 1)[:, None]) & (label_lengths[:, None] > 0))
    beta_init = jnp.where(init_ok, 0.0, NEG_INF)

    # allow_fwd[s]: transition s -> s+2 permitted == allow[s+2].
    allow_fwd = jnp.concatenate(
        [allow[:, 2:], jnp.zeros((B, 2), dtype=bool)], axis=1)

    def step(beta_next, xs):
        t, lp_next = xs  # lp_next = emissions at t+1
        b0 = beta_next + lp_next
        b1 = jnp.concatenate([b0[:, 1:], jnp.full((B, 1), NEG_INF)], 1)
        b2 = jnp.concatenate([b0[:, 2:], jnp.full((B, 2), NEG_INF)], 1)
        b2 = jnp.where(allow_fwd, b2, NEG_INF)
        beta = _logsumexp3(b0, b1, b2)
        beta = jnp.where(valid_s, beta, NEG_INF)
        # Reset rows whose last valid frame is t.
        beta = jnp.where((input_lengths - 1 == t)[:, None], beta_init, beta)
        return beta, beta

    ts = jnp.arange(T - 2, -1, -1)
    # For each t we need emissions at t+1.
    lp_next = lp_ext[1:][::-1]
    beta_last = jnp.where((input_lengths - 1 == T - 1)[:, None],
                          beta_init, NEG_INF)
    _, betas_rev = jax.lax.scan(step, beta_last, (ts, lp_next))
    betas = jnp.concatenate([betas_rev[::-1], beta_last[None]], axis=0)
    return betas


def _ctc_forward(log_probs, labels, input_lengths, label_lengths, blank):
    alphas, lls, (ext, allow, lp_ext, valid_s) = ctc_alphas(
        log_probs, labels, input_lengths, label_lengths, blank)
    T = log_probs.shape[1]
    t_idx = jnp.clip(input_lengths - 1, 0, T - 1)
    ll = jnp.take_along_axis(lls, t_idx[None, :], axis=0)[0]
    return ll, (alphas, ext, allow, lp_ext, valid_s)


@jax.custom_vjp
def _ctc_nll(log_probs, labels, input_lengths, label_lengths, blank):
    ll, _ = _ctc_forward(log_probs, labels, input_lengths, label_lengths,
                         blank)
    return -ll


def _ctc_nll_fwd(log_probs, labels, input_lengths, label_lengths, blank):
    ll, (alphas, ext, allow, lp_ext, valid_s) = _ctc_forward(
        log_probs, labels, input_lengths, label_lengths, blank)
    res = (alphas, ext, allow, lp_ext, valid_s, ll,
           input_lengths, label_lengths, log_probs.shape[2])
    return -ll, res


def _ctc_nll_bwd(res, g):
    (alphas, ext, allow, lp_ext, valid_s, ll,
     input_lengths, label_lengths, C) = res
    T, B, S = alphas.shape
    betas = ctc_betas(lp_ext, allow, valid_s, input_lengths, label_lengths)
    logZ = ll[None, :, None]                                # (1, B, 1)
    # Posterior over extended states; zero where invalid or past length.
    occ = jnp.exp(jnp.clip(alphas + betas - logZ, NEG_INF, 0.0))
    t_mask = (jnp.arange(T)[:, None] < input_lengths[None, :])
    finite = (ll > NEG_INF * 0.5)                           # infeasible rows
    occ = occ * (t_mask & finite[None, :])[:, :, None].astype(occ.dtype)
    occ = occ * valid_s[None].astype(occ.dtype)
    # Scatter S -> C with a one-hot matmul (per-sample label sets).
    onehot = jax.nn.one_hot(jnp.clip(ext, 0, C - 1), C, dtype=occ.dtype)
    grad_lp = -jnp.einsum("tbs,bsc->btc", occ, onehot)
    grad_lp = grad_lp * g[:, None, None]
    return grad_lp, None, None, None, None


_ctc_nll.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss(log_probs, labels, input_lengths, label_lengths,
             blank: int = 0, zero_infinity: bool = True) -> jnp.ndarray:
    """Per-utterance CTC NLL with analytic forward-backward gradient.

    Same contract as ctc_loss_ref; gradient computed from stored alphas plus
    one reverse beta scan (no autodiff through the forward scan).
    """
    loss = _ctc_nll(log_probs, jnp.asarray(labels, jnp.int32),
                    jnp.asarray(input_lengths, jnp.int32),
                    jnp.asarray(label_lengths, jnp.int32), blank)
    if zero_infinity:
        loss = jnp.where(loss >= -NEG_INF * 0.5, 0.0, loss)
    return loss
