"""Pallas GRU kernel vs lax.scan GRULayer: forward + full BPTT gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.models.layers import GRULayer
from tpuasr.ops import gru_scan

needs_interpret = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode():
    if needs_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _ref_gru(xp, wh, mask):
    """Plain scan reference with identical gate math (torch order r,z,n)."""
    T, B, H3 = xp.shape
    H = H3 // 3

    def step(h, inp):
        xp_t, m_t = inp
        hp = h @ wh
        r = jax.nn.sigmoid(xp_t[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp_t[:, H:2 * H] + hp[:, H:2 * H])
        n = jnp.tanh(xp_t[:, 2 * H:] + r * hp[:, 2 * H:])
        h_new = (1 - z) * n + z * h
        h_new = m_t * h_new + (1 - m_t) * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, jnp.zeros((B, H)), (xp, mask))
    return ys


def make(rng, T=24, B=4, H=16, ragged=True):
    xp = jnp.asarray(rng.standard_normal((T, B, 3 * H)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32)
    lens = np.full((B,), T)
    if ragged:
        lens = rng.integers(max(1, T // 3), T + 1, size=B)
        lens[0] = T
    mask = (np.arange(T)[:, None] < lens[None, :]).astype(np.float32)
    return xp, wh, jnp.asarray(mask)[:, :, None]


def test_forward_matches_scan(rng):
    xp, wh, mask = make(rng)
    ys_k = np.asarray(gru_scan(xp, wh, mask))
    ys_r = np.asarray(_ref_gru(xp, wh, mask))
    np.testing.assert_allclose(ys_k, ys_r, rtol=1e-5, atol=1e-5)


def test_forward_aligned_shapes(rng):
    """Shapes already tile-aligned (no padding path)."""
    xp, wh, mask = make(rng, T=16, B=8, H=128, ragged=False)
    ys_k = np.asarray(gru_scan(xp, wh, mask))
    ys_r = np.asarray(_ref_gru(xp, wh, mask))
    np.testing.assert_allclose(ys_k, ys_r, rtol=1e-4, atol=1e-4)


def test_grads_match_scan(rng):
    xp, wh, mask = make(rng, T=16, B=4, H=16)
    tgt = jnp.asarray(rng.standard_normal((16, 4, 16)), jnp.float32)

    def loss_k(xp, wh):
        return jnp.sum((gru_scan(xp, wh, mask) - tgt) ** 2 * mask)

    def loss_r(xp, wh):
        return jnp.sum((_ref_gru(xp, wh, mask) - tgt) ** 2 * mask)

    (dk_xp, dk_wh) = jax.grad(loss_k, argnums=(0, 1))(xp, wh)
    (dr_xp, dr_wh) = jax.grad(loss_r, argnums=(0, 1))(xp, wh)
    np.testing.assert_allclose(np.asarray(dk_xp), np.asarray(dr_xp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk_wh), np.asarray(dr_wh),
                               rtol=1e-4, atol=1e-4)


def test_grulayer_pallas_flag(rng):
    """GRULayer(use_pallas=True) == GRULayer(use_pallas=False)."""
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    layer_s = GRULayer(hidden=H, use_pallas=False)
    layer_p = GRULayer(hidden=H, use_pallas=True)
    v = layer_s.init(jax.random.PRNGKey(0), x, lens)
    y_s = np.asarray(layer_s.apply(v, x, lens))
    y_p = np.asarray(layer_p.apply(v, x, lens))
    np.testing.assert_allclose(y_p, y_s, rtol=1e-5, atol=1e-5)

    # Reverse direction too.
    layer_sr = GRULayer(hidden=H, reverse=True, use_pallas=False)
    layer_pr = GRULayer(hidden=H, reverse=True, use_pallas=True)
    vr = layer_sr.init(jax.random.PRNGKey(1), x, lens)
    np.testing.assert_allclose(
        np.asarray(layer_pr.apply(vr, x, lens)),
        np.asarray(layer_sr.apply(vr, x, lens)), rtol=1e-5, atol=1e-5)


def test_bf16_kernel_close_to_f32(rng):
    """bf16 IO with f32 gate math stays close to the f32 kernel."""
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    f32 = GRULayer(hidden=H, use_pallas=True, bf16_kernel=False)
    b16 = GRULayer(hidden=H, use_pallas=True, bf16_kernel=True)
    v = f32.init(jax.random.PRNGKey(0), x, lens)
    y32 = np.asarray(f32.apply(v, x, lens))
    y16 = np.asarray(b16.apply(v, x, lens))
    np.testing.assert_allclose(y16, y32, rtol=0.05, atol=0.05)
    # Gradients also flow.
    g = jax.grad(lambda p: jnp.sum(b16.apply(p, x, lens) ** 2))(v)
    assert all(np.all(np.isfinite(np.asarray(t)))
               for t in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_fused_bidir_matches_reference(rng):
    """FusedBiGRU == two reference scans run on its own params + grads."""
    from tpuasr.models.layers import BiGRU, reverse_sequences, sequence_mask
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    fused = BiGRU(hidden=H, fused_bidir=True)
    v = fused.init(jax.random.PRNGKey(0), x, lens)
    y = np.asarray(fused.apply(v, x, lens))

    p = v["params"]
    mask = np.asarray(sequence_mask(lens, T)).astype(np.float32)
    mask_t = jnp.asarray(mask.T)[:, :, None]

    def run_dir(pre, xin):
        xp = jnp.einsum("btd,dh->bth", xin, p[f"{pre}_wx"]) + p[f"{pre}_b"]
        return _ref_gru(jnp.transpose(xp, (1, 0, 2)), p[f"{pre}_wh"],
                        mask_t)

    yf = jnp.transpose(run_dir("fwd", x), (1, 0, 2))
    yb = reverse_sequences(
        jnp.transpose(run_dir("bwd", reverse_sequences(x, lens)),
                      (1, 0, 2)), lens)
    ref = np.asarray(jnp.concatenate([yf, yb], -1)
                     * jnp.asarray(mask)[:, :, None])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    # Gradients flow through the fused custom-VJP.
    g = jax.grad(lambda vv: jnp.sum(fused.apply(vv, x, lens) ** 2))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in leaves)
    assert sum(float(jnp.sum(jnp.abs(t))) for t in leaves) > 0

    # And match autodiff through the reference construction.
    def ref_loss(vv):
        pp = vv["params"]
        def run(pre, xin):
            xp = (jnp.einsum("btd,dh->bth", xin, pp[f"{pre}_wx"])
                  + pp[f"{pre}_b"])
            return _ref_gru(jnp.transpose(xp, (1, 0, 2)), pp[f"{pre}_wh"],
                            mask_t)
        yf = jnp.transpose(run("fwd", x), (1, 0, 2))
        yb = reverse_sequences(
            jnp.transpose(run("bwd", reverse_sequences(x, lens)),
                          (1, 0, 2)), lens)
        out = (jnp.concatenate([yf, yb], -1)
               * jnp.asarray(mask)[:, :, None])
        return jnp.sum(out ** 2)

    g_ref = jax.grad(ref_loss)(v)
    for k in g["params"]:
        np.testing.assert_allclose(np.asarray(g["params"][k]),
                                   np.asarray(g_ref["params"][k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


def test_fused_proj_matches_plain(rng):
    """gru_scan_xfused (projection in-kernel) == plain GRULayer, fwd+grads."""
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    plain = GRULayer(hidden=H, use_pallas=False)
    fused = GRULayer(hidden=H, use_pallas=True, fused_proj=True)
    v = plain.init(jax.random.PRNGKey(0), x, lens)
    y_p = np.asarray(plain.apply(v, x, lens))
    y_f = np.asarray(fused.apply(v, x, lens))
    np.testing.assert_allclose(y_f, y_p, rtol=1e-4, atol=1e-5)

    g_p = jax.grad(lambda vv: jnp.sum(plain.apply(vv, x, lens) ** 2))(v)
    g_f = jax.grad(lambda vv: jnp.sum(fused.apply(vv, x, lens) ** 2))(v)
    for k in g_p["params"]:
        np.testing.assert_allclose(np.asarray(g_f["params"][k]),
                                   np.asarray(g_p["params"][k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)


def test_fused_proj_recompute_backward(rng, monkeypatch):
    """The large-H backward fallback (XLA xp recompute + plain BPTT kernel)
    produces the same gradients as the fully-fused backward kernel."""
    from tpuasr.ops import pallas_gru as pg

    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    layer = GRULayer(hidden=H, use_pallas=True, fused_proj=True)
    v = layer.init(jax.random.PRNGKey(0), x, lens)
    loss = lambda vv: jnp.sum(layer.apply(vv, x, lens) ** 2)
    g_fused = jax.grad(loss)(v)

    monkeypatch.setattr(pg, "_XFB_RESIDENT_BUDGET", 0)  # force fallback
    g_rec = jax.grad(loss)(v)
    for k in g_fused["params"]:
        np.testing.assert_allclose(np.asarray(g_rec["params"][k]),
                                   np.asarray(g_fused["params"][k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_fused_proj_backward_dispatch():
    """Policy: DeepSpeech-scale H=512 layers (18.9 MB resident) must take
    the recompute path (measured regression on chip otherwise); H=256
    serving layers stay on the fully-fused kernel (measured win)."""
    from tpuasr.ops.pallas_gru import (_XFB_RESIDENT_BUDGET,
                                       _xfb_resident_bytes)

    assert _xfb_resident_bytes(1024, 512) > _XFB_RESIDENT_BUDGET
    assert _xfb_resident_bytes(1312, 256) <= _XFB_RESIDENT_BUDGET


def test_bf16_fused_proj_grads(rng):
    """bf16 IO through the fully-fused projection backward: finite grads,
    close to the f32 fused path (covers the mixed-dtype dwx contraction)."""
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    f32 = GRULayer(hidden=H, use_pallas=True, fused_proj=True)
    b16 = GRULayer(hidden=H, use_pallas=True, fused_proj=True,
                   bf16_kernel=True)
    v = f32.init(jax.random.PRNGKey(0), x, lens)
    g32 = jax.grad(lambda p: jnp.sum(f32.apply(p, x, lens) ** 2))(v)
    g16 = jax.grad(lambda p: jnp.sum(b16.apply(p, x, lens) ** 2))(v)
    for k in g32["params"]:
        a, b = np.asarray(g16["params"][k]), np.asarray(g32["params"][k])
        assert np.all(np.isfinite(a)), k
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.5, err_msg=k)


@pytest.mark.parametrize("fused", [False, True])
def test_reverse_kernel_grads_match_scan(rng, fused):
    """Reversed-iteration kernels (no reverse_sequences gathers) produce
    the plain-path gradients for ragged rows, both VJP variants."""
    B, T, D, H = 2, 20, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 7], jnp.int32)
    ref = GRULayer(hidden=H, reverse=True, use_pallas=False)
    ker = GRULayer(hidden=H, reverse=True, use_pallas=True,
                   fused_proj=fused)
    v = ref.init(jax.random.PRNGKey(0), x, lens)
    loss = lambda m: (lambda p: jnp.sum(m.apply(p, x, lens) ** 2))
    g_ref = jax.grad(loss(ref))(v)
    g_ker = jax.grad(loss(ker))(v)
    for k in g_ref["params"]:
        np.testing.assert_allclose(np.asarray(g_ker["params"][k]),
                                   np.asarray(g_ref["params"][k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
