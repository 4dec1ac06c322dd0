"""Pallas CTC kernel parity vs the jnp reference implementations.

On CPU the kernels run in pallas interpreter mode (conftest forces the CPU
backend); on TPU the same tests exercise the compiled Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuasr.losses.ctc_pallas as cp
from tpuasr.losses import ctc_loss, ctc_loss_ref
from tpuasr.losses.ctc_pallas import ctc_loss_pallas
from tpuasr.losses.ctc_ref import ctc_alphas

from tests.test_ctc import make_problem

needs_interpret = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if needs_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def test_alphas_match_reference(rng):
    lp, labels, il, ll = make_problem(rng, B=3, T=40, C=12, U=8)
    a_ref, lls, _ = ctc_alphas(jnp.asarray(lp), labels, il, ll)
    a_pal, ll_pal, _ = cp.ctc_alphas_pallas(jnp.asarray(lp), labels, il, ll)
    a_ref = np.asarray(a_ref)
    a_pal = np.asarray(a_pal)
    assert a_pal.shape == a_ref.shape
    # Compare only reachable entries (both should be ~NEG_INF elsewhere).
    mask = a_ref > cp.NEG_INF * 0.5
    np.testing.assert_allclose(a_pal[mask], a_ref[mask], rtol=1e-4,
                               atol=1e-4)
    # Final log-likelihoods.
    T = lp.shape[1]
    t_idx = np.clip(il - 1, 0, T - 1)
    ll_ref = np.take_along_axis(np.asarray(lls), t_idx[None, :], axis=0)[0]
    np.testing.assert_allclose(np.asarray(ll_pal), ll_ref, rtol=1e-4)


def test_loss_matches_fb(rng):
    lp, labels, il, ll = make_problem(rng, B=4, T=50, C=16, U=10)
    ours = np.asarray(ctc_loss_pallas(jnp.asarray(lp), labels, il, ll))
    ref = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_grad_matches_fb(rng):
    lp, labels, il, ll = make_problem(rng, B=3, T=30, C=8, U=5)
    g_pal = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss_pallas(x, labels, il, ll)))(
            jnp.asarray(lp)))
    g_ref = np.asarray(jax.grad(
        lambda x: jnp.sum(ctc_loss_ref(x, labels, il, ll)))(jnp.asarray(lp)))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-3, atol=1e-5)


def test_multi_tblock(rng):
    """T spanning multiple T_BLK grid steps exercises the carry scratch."""
    T = cp._tiles(2, 128)[2] * 2 + 17
    lp, labels, il, ll = make_problem(rng, B=2, T=T, C=6, U=4, min_T=T - 40)
    ours = np.asarray(ctc_loss_pallas(jnp.asarray(lp), labels, il, ll))
    ref = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_multi_bblock(rng, monkeypatch):
    """B spanning multiple B_BLK grid rows exercises carry re-init.

    Production tiles put up to 256 rows in one block (a 259-row interpret
    run would crawl on CPU), so force small tiles through _tiles — the
    builders consume (Bp, B_BLK, T_BLK) verbatim, same code path."""
    monkeypatch.setattr(cp, "_tiles", lambda B, S_pad: (16, 8, 16))
    cp._build_alpha_call.cache_clear()
    cp._build_beta_call.cache_clear()
    B = 8 + 3
    lp, labels, il, ll = make_problem(rng, B=B, T=30, C=8, U=5)
    ours = np.asarray(ctc_loss_pallas(jnp.asarray(lp), labels, il, ll))
    ref = np.asarray(ctc_loss(jnp.asarray(lp), labels, il, ll))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_empty_label(rng):
    B, T, C = 2, 12, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.zeros((B, 3), np.int32)
    il = np.array([T, 8], np.int32)
    ll = np.array([0, 0], np.int32)
    ours = np.asarray(ctc_loss_pallas(jnp.asarray(lp), labels, il, ll))
    expect = np.array([-lp[0, :T, 0].sum(), -lp[1, :8, 0].sum()])
    np.testing.assert_allclose(ours, expect, rtol=1e-4)
