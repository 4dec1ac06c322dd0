"""int8 tap-GEMM conv frontend (tpuasr.ops.pallas_conv, layers.FrontConv
use_matmul_q8): the same gate structure as the q8 GRU (tests/test_quant_gru)
— an exact-grid test where quantization is lossless (kernel must equal the
f32 band-matmul to f32 resolution), the kernel == the pure-jnp quantized
oracle to fp rounding, bounded error on random inputs vs the sliding conv,
and model-level serving equivalence from one shared f32 checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.models.layers import FrontConv
from tpuasr.ops.pallas_conv import conv_taps_q8, reference_q8_conv_taps
from tpuasr.ops.quant import quantize_per_channel


def _grid_input(rng, B, T, K):
    """Rows already on the int8 grid: integer entries, absmax exactly 127
    -> the dynamic per-row quantizer is lossless."""
    x = rng.integers(-127, 128, size=(B, T, K)).astype(np.float32)
    x[:, :, 0] = 127.0  # pin the absmax so scale = 1.0 exactly
    return jnp.asarray(x)


def _band(rng, Kt, K, N, grid=False):
    if grid:
        q = rng.integers(-127, 128, size=(Kt, K, N)).astype(np.float32)
        q[:, 0, :] = 127.0
        scale = rng.uniform(0.5, 2.0, size=(N,)).astype(np.float32) / 127.0
        m = q * scale[None, None, :]
    else:
        m = rng.standard_normal((Kt, K, N)).astype(np.float32) * 0.1
    return jnp.asarray(m)


class TestKernel:
    def test_exact_grid_matches_f32(self):
        rng = np.random.default_rng(0)
        B, T, K, N, Kt = 2, 40, 128, 128, 5
        x = _grid_input(rng, B, T + Kt - 1, K)
        m = _band(rng, Kt, K, N, grid=True)
        mq, sw = quantize_per_channel(m.reshape(-1, N))
        mq = mq.reshape(Kt, K, N)
        out = conv_taps_q8(x, mq, sw, T)
        # Gold in EXACT integer arithmetic (f64 dots of the int grids):
        # on grid data the q8 path is exact up to the final scale multiply,
        # and is in fact MORE accurate than an f32 band-matmul of the same
        # data (whose f32 accumulation of ~1e4-magnitude products drifts).
        xg = np.asarray(x, np.float64)
        qg = np.asarray(mq, np.float64)
        gold = np.zeros((B, T, N), np.float64)
        for t in range(Kt):
            gold += xg[:, t:t + T] @ qg[t]
        gold *= np.asarray(sw, np.float64)[None, None, :]
        np.testing.assert_allclose(np.asarray(out, np.float64), gold,
                                   rtol=1e-6, atol=1e-3)

    @pytest.mark.parametrize("mode", ["im2col", "taps", "slab"])
    def test_kernel_matches_reference(self, mode):
        rng = np.random.default_rng(1)
        B, T, K, N, Kt = 3, 50, 128, 256, 11
        x = jnp.asarray(rng.standard_normal((B, T + Kt - 1, K))
                        .astype(np.float32))
        m = _band(rng, Kt, K, N)
        mq, sw = quantize_per_channel(m.reshape(-1, N))
        mq = mq.reshape(Kt, K, N)
        a = conv_taps_q8(x, mq, sw, T, mode=mode)
        if mode == "slab":
            # no jnp mirror for the slab experiment: gate vs f32 instead
            gold = jnp.zeros((B, T, N), jnp.float32)
            for t in range(Kt):
                gold = gold + jax.lax.dot_general(
                    x[:, t:t + T], m[t], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            g = np.asarray(gold)
            err = np.abs(np.asarray(a) - g).max() / np.abs(g).std()
            assert err < 0.2, err
            return
        b = reference_q8_conv_taps(x, mq, sw, T, mode=mode)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_multi_block_time(self):
        # T spanning several T_BLK blocks + a ragged tail: the t+1
        # BlockSpec and trailing zero block must hand frames across
        # block boundaries exactly.
        rng = np.random.default_rng(2)
        B, T, K, N, Kt = 1, 300, 128, 128, 7
        x = jnp.asarray(rng.standard_normal((B, T + Kt - 1, K))
                        .astype(np.float32))
        m = _band(rng, Kt, K, N)
        mq, sw = quantize_per_channel(m.reshape(-1, N))
        mq = mq.reshape(Kt, K, N)
        a = conv_taps_q8(x, mq, sw, T)
        b = reference_q8_conv_taps(x, mq, sw, T)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    def test_bounded_error_vs_f32(self):
        rng = np.random.default_rng(3)
        B, T, K, N, Kt = 2, 30, 128, 128, 5
        x = jnp.asarray(rng.standard_normal((B, T + Kt - 1, K))
                        .astype(np.float32))
        m = _band(rng, Kt, K, N)
        mq, sw = quantize_per_channel(m.reshape(-1, N))
        out = conv_taps_q8(x, mq.reshape(Kt, K, N), sw, T)
        gold = jnp.zeros((B, T, N), jnp.float32)
        for t in range(Kt):
            gold = gold + jax.lax.dot_general(
                x[:, t:t + T], m[t], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # Error scale: per-row activation rounding (~absmax/254 per
        # element) through the taps — bound the max deviation relative to
        # the output distribution's scale, not per-entry (tails dominate).
        g = np.asarray(gold)
        err = np.abs(np.asarray(out) - g).max() / np.abs(g).std()
        assert err < 0.15, err


class TestFrontConv:
    def _conv_pair(self, rng, q8):
        x = jnp.asarray(rng.standard_normal((2, 37, 32, 32))
                        .astype(np.float32))
        mod = FrontConv(32, (11, 21), strides=(1, 2), padding="SAME",
                        use_matmul_q8=q8)
        v = mod.init(jax.random.PRNGKey(0), x)
        return mod, v, x

    def test_q8_close_to_conv(self):
        rng = np.random.default_rng(4)
        conv, v, x = self._conv_pair(rng, q8=False)
        q8m, _, _ = self._conv_pair(rng, q8=True)
        gold = conv.apply(v, x)
        out = q8m.apply(v, x)
        assert out.shape == gold.shape
        scale = float(jnp.abs(gold).max())
        err = float(jnp.abs(out - gold).max()) / scale
        assert err < 0.02, err

    def test_q8_requires_stride1(self):
        mod = FrontConv(32, (11, 21), strides=(2, 2), padding="SAME",
                        use_matmul_q8=True)
        x = jnp.zeros((1, 16, 32, 32), jnp.float32)
        with pytest.raises(ValueError, match="stride 1"):
            mod.init(jax.random.PRNGKey(0), x)


class TestModel:
    def test_int8_conv_serving_agrees(self):
        from tpuasr.models import create_model
        B, T, F, C = 2, 64, 64, 16
        rng = np.random.default_rng(5)
        feats = jnp.asarray(rng.standard_normal((B, T, F))
                            .astype(np.float32))
        lens = jnp.asarray([T, T - 10], jnp.int32)
        base = create_model("deepspeech_ctc", num_classes=C, rnn_hidden=64,
                            rnn_layers=1)
        q8 = create_model("deepspeech_ctc", num_classes=C, rnn_hidden=64,
                          rnn_layers=1, int8_conv=True)
        v = jax.jit(base.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), feats, lens, train=False)
        la, na = base.apply(v, feats, lens, train=False)
        lb, nb = q8.apply(v, feats, lens, train=False)
        np.testing.assert_array_equal(np.asarray(na), np.asarray(nb))
        # argmax agreement on the valid region
        aa = np.asarray(jnp.argmax(la, -1))
        ab = np.asarray(jnp.argmax(lb, -1))
        T2 = int(na[0])
        agree = (aa[:, :T2] == ab[:, :T2]).mean()
        assert agree > 0.97, agree

    def test_int8_conv_train_falls_back(self):
        # train=True must route to the differentiable sliding conv.
        from tpuasr.models import create_model
        B, T, F, C = 1, 32, 64, 8
        rng = np.random.default_rng(6)
        feats = jnp.asarray(rng.standard_normal((B, T, F))
                            .astype(np.float32))
        lens = jnp.asarray([T], jnp.int32)
        m = create_model("deepspeech_ctc", num_classes=C, rnn_hidden=32,
                         rnn_layers=1, int8_conv=True, dropout=0.0)
        v = jax.jit(m.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), feats, lens, train=False)

        def loss(p):
            lp, _ = m.apply({**v, "params": p}, feats, lens, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])[0]
            return jnp.sum(lp ** 2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
