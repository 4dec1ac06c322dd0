"""int8 fused-projection GRU (inference serving path).

Exactness strategy: when both the activation rows and the weight columns
already sit on the int8 grid (absmax exactly 127, integer entries), the
dynamic quantizer reproduces them bit-for-bit and the int32 accumulation
is exact, so the q8 scan must match the f32 fused scan to f32 resolution
— a plumbing test no tolerance can hide bugs behind. Random inputs then
bound the genuine quantization error.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuasr.ops.pallas_gru import gru_scan_xfused, gru_scan_xfused_q8
from tpuasr.ops.quant import dequantize_per_channel, quantize_per_channel


def _mask(T, B, lens):
    m = (np.arange(T)[:, None] < np.asarray(lens)[None, :])
    return jnp.asarray(m[:, :, None].astype(np.float32))


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
    wq, s = quantize_per_channel(w)
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_per_channel(wq, s)) - np.asarray(w))
    # Rounding to the per-channel grid: error <= scale/2 everywhere.
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()


def test_quantize_exact_on_grid():
    rng = np.random.default_rng(1)
    w = rng.integers(-127, 128, size=(32, 48)).astype(np.float32)
    w[0, :] = 127.0                   # every column's absmax = 127 -> s = 1
    wq, s = quantize_per_channel(jnp.asarray(w))
    np.testing.assert_array_equal(np.asarray(wq), w.astype(np.int8))
    np.testing.assert_allclose(np.asarray(s), 1.0, rtol=0, atol=0)


def _grid_case(T, B, D, H, seed=2):
    """Inputs already on the int8 grid: quantization is lossless."""
    rng = np.random.default_rng(seed)
    x = rng.integers(-127, 128, size=(T, B, D)).astype(np.float32)
    x[:, :, 0] = 127.0                # per-row absmax = 127 -> sx = 1
    wx = rng.integers(-8, 9, size=(D, 3 * H)).astype(np.float32)
    wx[0, :] = 127.0                  # per-column absmax = 127 -> sw = 1
    # Keep gates in a numerically alive range despite the integer xp.
    wx *= 1.0
    b = rng.standard_normal(3 * H).astype(np.float32)
    wh = (rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    lens = rng.integers(T // 2, T + 1, size=B)
    return (jnp.asarray(x), jnp.asarray(wx), jnp.asarray(b),
            jnp.asarray(wh), _mask(T, B, lens))


@pytest.mark.parametrize("reverse", [False, True])
def test_q8_exact_on_grid(reverse):
    T, B, D, H = 16, 8, 128, 128
    x, wx, b, wh, mask = _grid_case(T, B, D, H)
    wq, sw = quantize_per_channel(wx)
    ys_q = gru_scan_xfused_q8(x, wq, sw, b, wh, mask, reverse=reverse)
    ys_f = gru_scan_xfused(x, wx, b, wh, mask, reverse=reverse)
    # Both paths compute the identical exact xp (integer dot < 2^24), so
    # the scans agree to f32 resolution, not a quantization tolerance.
    np.testing.assert_allclose(np.asarray(ys_q), np.asarray(ys_f),
                               rtol=1e-5, atol=1e-5)


def test_q8_random_error_bounded():
    T, B, D, H = 16, 8, 256, 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    wx = jnp.asarray(
        rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(3 * H).astype(np.float32) * 0.1)
    wh = jnp.asarray(
        rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    mask = _mask(T, B, rng.integers(T // 2, T + 1, size=B))
    wq, sw = quantize_per_channel(wx)
    ys_q = np.asarray(gru_scan_xfused_q8(x, wq, sw, b, wh, mask))
    ys_f = np.asarray(gru_scan_xfused(x, wx, b, wh, mask))
    # GRU outputs are tanh-bounded; int8 per-row/per-channel error stays
    # small even after recurrence compounds it.
    assert np.abs(ys_q - ys_f).mean() < 0.02
    assert np.abs(ys_q - ys_f).max() < 0.25
    cc = np.corrcoef(ys_q.ravel(), ys_f.ravel())[0, 1]
    assert cc > 0.995


def test_q8_unaligned_shapes_pad_path():
    # D, H off the 128 grid and T off the block grid exercise the pad path.
    T, B, D, H = 10, 5, 96, 64
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    wx = jnp.asarray(
        rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.1)
    b = jnp.zeros(3 * H, jnp.float32)
    wh = jnp.asarray(
        rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    mask = _mask(T, B, rng.integers(2, T + 1, size=B))
    wq, sw = quantize_per_channel(wx)
    ys_q = np.asarray(gru_scan_xfused_q8(x, wq, sw, b, wh, mask))
    ys_f = np.asarray(gru_scan_xfused(x, wx, b, wh, mask))
    assert ys_q.shape == ys_f.shape == (T, B, H)
    assert np.abs(ys_q - ys_f).mean() < 0.03


def test_q8_rejects_wrong_dtype_and_wide_d():
    x = jnp.zeros((16, 8, 128), jnp.float32)
    wh = jnp.zeros((128, 384), jnp.float32)
    b = jnp.zeros(384, jnp.float32)
    mask = jnp.ones((16, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        gru_scan_xfused_q8(x, jnp.zeros((128, 384), jnp.float32),
                           jnp.ones(384), b, wh, mask)
    xw = jnp.zeros((16, 8, 2048), jnp.float32)
    with pytest.raises(ValueError, match="1040"):
        gru_scan_xfused_q8(xw, jnp.zeros((2048, 384), jnp.int8),
                           jnp.ones(384), b, wh, mask)


def test_model_int8_proj_close_to_f32_and_train_ignores_it():
    from tpuasr.models import create_model
    import jax

    B, T, F, C = 2, 37, 32, 16
    kw = dict(num_classes=C, rnn_hidden=64, rnn_layers=2, conv_channels=8,
              dropout=0.0, pallas_gru=True, fused_proj=True)
    m_f = create_model("deepspeech_ctc", **kw)
    m_q = create_model("deepspeech_ctc", **{**kw, "int8_proj": True})
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(np.array([T, T - 9], np.int32))
    variables = m_f.init(jax.random.PRNGKey(0), feats, lens, train=False)
    lp_f, ol = m_f.apply(variables, feats, lens, train=False)
    lp_q, _ = m_q.apply(variables, feats, lens, train=False)
    assert np.isfinite(np.asarray(lp_q)).all()
    # Same checkpoint serves both paths; log-probs must stay close and the
    # greedy argmax essentially unchanged.
    valid = np.arange(lp_f.shape[1])[None, :] < np.asarray(ol)[:, None]
    diff = np.abs(np.asarray(lp_q) - np.asarray(lp_f))[valid]
    assert diff.mean() < 0.1
    agree = (np.asarray(lp_q).argmax(-1) == np.asarray(lp_f).argmax(-1))
    assert agree[valid].mean() > 0.95
    # train=True must take the differentiable f32 path (grads exist and
    # match the f32 model's).
    g_q = jax.grad(lambda p: m_q.apply(
        {**variables, "params": p}, feats, lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])[0][0].sum())(variables["params"])
    g_f = jax.grad(lambda p: m_f.apply(
        {**variables, "params": p}, feats, lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])[0][0].sum())(variables["params"])
    flat_q = jax.tree_util.tree_leaves(g_q)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, c in zip(flat_q, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


def test_q8_kernel_matches_reference_both_modes():
    """The Pallas kernel must reproduce the pure-jnp reference of the SAME
    quantized math to fp rounding — proj-only and proj+recurrent modes."""
    from tpuasr.ops.quant import reference_q8_gru_scan
    T, B, D, H = 16, 8, 256, 128
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    wx = jnp.asarray(
        rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(3 * H).astype(np.float32) * 0.1)
    wh = jnp.asarray(
        rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    mask = _mask(T, B, rng.integers(T // 2, T + 1, size=B))
    wxq, sw = quantize_per_channel(wx)
    whq, swh = quantize_per_channel(wh)
    for reverse in (False, True):
        ys_k = gru_scan_xfused_q8(x, wxq, sw, b, wh, mask, reverse=reverse)
        ys_r = reference_q8_gru_scan(x, wxq, sw, b, wh, mask,
                                     reverse=reverse)
        np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                                   rtol=2e-5, atol=2e-5)
        ys_k2 = gru_scan_xfused_q8(x, wxq, sw, b, whq, mask,
                                   reverse=reverse, wh_scale=swh)
        ys_r2 = reference_q8_gru_scan(x, wxq, sw, b, whq, mask,
                                      reverse=reverse, wh_scale=swh)
        np.testing.assert_allclose(np.asarray(ys_k2), np.asarray(ys_r2),
                                   rtol=2e-5, atol=2e-5)


def test_q8_rec_error_bounded_vs_f32():
    """int8 recurrence compounds per-step quantization; stays bounded."""
    T, B, D, H = 16, 8, 256, 128
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
    wx = jnp.asarray(
        rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(3 * H).astype(np.float32) * 0.1)
    wh = jnp.asarray(
        rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.05)
    mask = _mask(T, B, rng.integers(T // 2, T + 1, size=B))
    wxq, sw = quantize_per_channel(wx)
    whq, swh = quantize_per_channel(wh)
    ys_q = np.asarray(gru_scan_xfused_q8(x, wxq, sw, b, whq, mask,
                                         wh_scale=swh))
    ys_f = np.asarray(gru_scan_xfused(x, wx, b, wh, mask))
    assert np.abs(ys_q - ys_f).mean() < 0.03
    assert np.corrcoef(ys_q.ravel(), ys_f.ravel())[0, 1] > 0.99


def test_model_int8_rec_runs():
    from tpuasr.models import create_model
    import jax

    B, T, F, C = 2, 37, 32, 16
    kw = dict(num_classes=C, rnn_hidden=64, rnn_layers=2, conv_channels=8,
              dropout=0.0, pallas_gru=True, fused_proj=True)
    m_f = create_model("deepspeech_ctc", **kw)
    m_q = create_model("deepspeech_ctc", **{**kw, "int8_rec": True})
    rng = np.random.default_rng(9)
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    lens = jnp.asarray(np.array([T, T - 9], np.int32))
    variables = m_f.init(jax.random.PRNGKey(0), feats, lens, train=False)
    lp_f, ol = m_f.apply(variables, feats, lens, train=False)
    lp_q, _ = m_q.apply(variables, feats, lens, train=False)
    assert np.isfinite(np.asarray(lp_q)).all()
    valid = np.arange(lp_f.shape[1])[None, :] < np.asarray(ol)[:, None]
    agree = (np.asarray(lp_q).argmax(-1) == np.asarray(lp_f).argmax(-1))
    assert agree[valid].mean() > 0.9
