"""Fused Pallas dynamic-routing kernel vs the pure-jnp einsum + routing
reference: forward parity, full gradient parity (du, dW — the custom VJP
must reproduce the reference's stop-gradient-iterations semantics), lane
padding, and model-level equivalence of CapsNetCTC's pallas_routing flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.models.capsnet import dynamic_routing
from tpuasr.ops.pallas_routing import routed_caps

needs_interpret = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode():
    if needs_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def ref_routed(u, W, O, D, iters=3):
    B, T, I, Din = u.shape
    u_hat = jnp.einsum("btid,idk->btik", u, W,
                       preferred_element_type=jnp.float32)
    u_hat = u_hat.reshape(B, T, I, O, D)
    return dynamic_routing(u_hat, iters)


CASES = [
    # (B, T, I, Din, O, D) — I=128-aligned and not; O*D multiple of 8.
    (2, 3, 128, 8, 12, 8),
    (1, 4, 96, 8, 10, 4),          # I padded 96 -> 128
    (2, 2, 256, 4, 6, 16),
]


@pytest.mark.parametrize("B,T,I,Din,O,D", CASES)
def test_forward_parity(B, T, I, Din, O, D):
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, T, I, Din)), jnp.float32) * 0.5
    W = jnp.asarray(rng.normal(size=(I, Din, O * D)), jnp.float32) * 0.2
    ref = ref_routed(u, W, O, D)
    got = routed_caps(u, W, O, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("B,T,I,Din,O,D", CASES[:2])
def test_grad_parity(B, T, I, Din, O, D):
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, T, I, Din)), jnp.float32) * 0.5
    W = jnp.asarray(rng.normal(size=(I, Din, O * D)), jnp.float32) * 0.2
    tgt = jnp.asarray(rng.normal(size=(B, T, O, D)), jnp.float32)

    def loss_ref(u, W):
        return jnp.sum((ref_routed(u, W, O, D) - tgt) ** 2)

    def loss_ker(u, W):
        return jnp.sum((routed_caps(u, W, O, D) - tgt) ** 2)

    gu_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(u, W)
    gu_k, gw_k = jax.grad(loss_ker, argnums=(0, 1))(u, W)
    np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_iters_variants():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(1, 2, 128, 8)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(128, 8, 48)), jnp.float32) * 0.2
    for iters in (1, 2, 4):
        ref = ref_routed(u, W, 6, 8, iters)
        got = routed_caps(u, W, 6, 8, iters)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def test_rejects_bad_od():
    u = jnp.zeros((1, 1, 128, 8))
    W = jnp.zeros((128, 8, 3 * 7))
    with pytest.raises(ValueError, match="multiple of 8"):
        routed_caps(u, W, 3, 7)


def test_model_flag_parity():
    from tpuasr.models.capsnet import CapsNetCTC
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(2, 32, 40)), jnp.float32)
    lens = jnp.asarray([32, 20], jnp.int32)
    kw = dict(num_classes=16, conv_channels=8, primary_caps=4,
              primary_dim=4, class_dim=4, routing_iters=3)
    m_ref = CapsNetCTC(**kw, pallas_routing=False)
    m_ker = CapsNetCTC(**kw, pallas_routing=True)
    vars_ = m_ref.init(jax.random.PRNGKey(0), feats, lens, train=False)
    lp_r, ol_r = m_ref.apply(vars_, feats, lens, train=False)
    lp_k, ol_k = m_ker.apply(vars_, feats, lens, train=False)
    assert np.array_equal(np.asarray(ol_r), np.asarray(ol_k))
    np.testing.assert_allclose(np.asarray(lp_k), np.asarray(lp_r),
                               rtol=2e-5, atol=1e-5)
