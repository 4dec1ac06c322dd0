"""CTC loss parity tests (BASELINE north star: losses match to tolerance).

Oracles: torch.nn.CTCLoss (CPU, same blank=0 convention as the reference's
warp-ctc) and optax.ctc_loss. Gradient parity: analytic custom-VJP vs torch
autograd and vs JAX autodiff through the reference scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from tpuasr.losses import ctc_loss, ctc_loss_ref


def make_problem(rng, B=4, T=50, C=20, U=12, min_T=10):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = rng.integers(1, C, size=(B, U)).astype(np.int32)
    input_lengths = rng.integers(min_T, T + 1, size=(B,)).astype(np.int32)
    input_lengths[0] = T
    label_lengths = rng.integers(1, U + 1, size=(B,)).astype(np.int32)
    label_lengths[0] = U
    # Keep problems feasible: T >= 2U+1 not required, but U <= T.
    label_lengths = np.minimum(label_lengths, input_lengths // 3)
    label_lengths = np.maximum(label_lengths, 1)
    return log_probs, labels, input_lengths, label_lengths


def torch_ctc(log_probs, labels, input_lengths, label_lengths,
              want_grad=False):
    lp = torch.from_numpy(np.transpose(log_probs, (1, 0, 2))).double()
    lp.requires_grad_(want_grad)
    targets = torch.from_numpy(labels.astype(np.int64))
    loss = torch.nn.CTCLoss(blank=0, reduction="none", zero_infinity=True)(
        lp, targets, torch.from_numpy(input_lengths.astype(np.int64)),
        torch.from_numpy(label_lengths.astype(np.int64)))
    if want_grad:
        loss.sum().backward()
        return (loss.detach().numpy(),
                np.transpose(lp.grad.numpy(), (1, 0, 2)))
    return loss.detach().numpy()


@pytest.mark.parametrize("impl", [ctc_loss_ref, ctc_loss])
def test_loss_matches_torch(rng, impl):
    lp, labels, il, ll = make_problem(rng)
    ours = np.asarray(impl(jnp.asarray(lp), labels, il, ll))
    ref = torch_ctc(lp, labels, il, ll)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", [ctc_loss_ref, ctc_loss])
def test_loss_matches_optax(rng, impl):
    lp, labels, il, ll = make_problem(rng)
    B, T, C = lp.shape
    U = labels.shape[1]
    logit_pad = (np.arange(T)[None] >= il[:, None]).astype(np.float32)
    label_pad = (np.arange(U)[None] >= ll[:, None]).astype(np.float32)
    ref = np.asarray(optax.ctc_loss(jnp.asarray(lp), jnp.asarray(logit_pad),
                                    jnp.asarray(labels),
                                    jnp.asarray(label_pad), blank_id=0))
    ours = np.asarray(impl(jnp.asarray(lp), labels, il, ll))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_grad_matches_torch(rng):
    """torch.nn.CTCLoss's grad is w.r.t. LOGITS (it folds the log_softmax
    Jacobian in even when handed log-probs — documented torch behavior), so
    compare through log_softmax on our side."""
    lp, labels, il, ll = make_problem(rng, B=3, T=30, C=10, U=6)
    ref_loss, ref_grad = torch_ctc(lp, labels, il, ll, want_grad=True)

    f = lambda x: jnp.sum(ctc_loss(jax.nn.log_softmax(x, -1), labels, il, ll))
    ours_grad = np.asarray(jax.grad(f)(jnp.asarray(lp)))
    # Zero rows past input_length on the torch side are already zero on ours.
    np.testing.assert_allclose(ours_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_grad_fb_matches_autodiff(rng):
    lp, labels, il, ll = make_problem(rng, B=3, T=25, C=8, U=5)
    g_ref = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss_ref(x, labels, il, ll)))(jnp.asarray(lp)))
    g_fb = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss(x, labels, il, ll)))(jnp.asarray(lp)))
    np.testing.assert_allclose(g_fb, g_ref, rtol=1e-3, atol=1e-5)


def test_empty_label(rng):
    """U_eff=0: loss must be -sum log p_blank over valid frames."""
    B, T, C = 2, 12, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.zeros((B, 3), np.int32)
    il = np.array([T, 8], np.int32)
    ll = np.array([0, 0], np.int32)
    ours = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    expect = np.array([-lp[0, :T, 0].sum(), -lp[1, :8, 0].sum()])
    np.testing.assert_allclose(ours, expect, rtol=1e-4)


def test_repeated_labels(rng):
    """Repeats force blank insertion; parity vs torch on aaba-style targets."""
    B, T, C = 1, 20, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.array([[2, 2, 3, 2]], np.int32)
    il = np.array([T], np.int32)
    ll = np.array([4], np.int32)
    ours = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    ref = torch_ctc(lp, labels, il, ll)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_infeasible_zeroed(rng):
    """2U+1 > T (with repeats) is infeasible -> zero_infinity maps to 0."""
    B, T, C = 1, 4, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.array([[1, 1, 1]], np.int32)  # needs >= 5 frames
    il = np.array([T], np.int32)
    ll = np.array([3], np.int32)
    ours = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    np.testing.assert_allclose(ours, [0.0], atol=1e-6)
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss(x, labels, il, ll)))(jnp.asarray(lp)))
    assert np.all(np.isfinite(g))
    np.testing.assert_allclose(g, 0.0, atol=1e-6)


def test_grad_zero_past_length(rng):
    lp, labels, il, ll = make_problem(rng, B=3, T=30, C=10, U=6)
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss(x, labels, il, ll)))(jnp.asarray(lp)))
    for b in range(3):
        np.testing.assert_allclose(g[b, il[b]:], 0.0, atol=1e-8)


def test_jit_and_vmap_safe(rng):
    lp, labels, il, ll = make_problem(rng, B=2, T=20, C=8, U=4)
    f = jax.jit(lambda x: ctc_loss(x, labels, il, ll))
    eager = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    jitted = np.asarray(f(jnp.asarray(lp)))
    np.testing.assert_allclose(jitted, eager, rtol=1e-5)
