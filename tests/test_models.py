"""Acoustic model tests: shapes, length arithmetic, padding invariance,
gradient flow, and tiny CTC overfit (BASELINE configs #2-#4 correctness side).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpuasr.losses import ctc_loss
from tpuasr.models import CapsNetCTC, DeepSpeechCTC, ResNetCTC, create_model

SMALL = {
    "resnet": lambda C: ResNetCTC(num_classes=C, stem_channels=8,
                                  stage_channels=(8, 16),
                                  blocks_per_stage=1, dropout=0.0),
    "deepspeech": lambda C: DeepSpeechCTC(num_classes=C, rnn_hidden=16,
                                          rnn_layers=2, conv_channels=4,
                                          dropout=0.0),
    "capsnet": lambda C: CapsNetCTC(num_classes=C, conv_channels=8,
                                    primary_caps=4, primary_dim=4,
                                    class_dim=8),
}


def init_and_forward(model, B=2, T=40, F=32, train=False):
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    lens = jnp.array([T, T - 13], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), feats, lens, train=False)
    out = model.apply(variables, feats, lens, train=train,
                      mutable=["batch_stats"] if train else False,
                      rngs={"dropout": jax.random.PRNGKey(2)} if train else {})
    return variables, feats, lens, out


@pytest.mark.parametrize("name", list(SMALL))
def test_forward_shapes_and_lengths(name):
    C = 7
    model = SMALL[name](C)
    _, feats, lens, out = init_and_forward(model)
    logp, out_lens = out
    B, Tp, Cout = logp.shape
    assert Cout == C
    # Length arithmetic matches the actual conv output length.
    assert int(out_lens[0]) == Tp
    assert int(out_lens[1]) <= Tp
    # Valid frames are normalized log-probs; padded frames zeroed.
    probs = np.exp(np.asarray(logp))
    np.testing.assert_allclose(probs[0].sum(-1), 1.0, rtol=1e-4)
    n1 = int(out_lens[1])
    np.testing.assert_allclose(np.asarray(logp)[1, n1:], 0.0, atol=1e-6)


@pytest.mark.parametrize("name", list(SMALL))
def test_padding_invariance(name):
    """Same features, different amounts of zero padding -> identical valid
    output frames (eval mode). This is what makes length-bucketing safe."""
    C = 5
    model = SMALL[name](C)
    B, T, F = 1, 36, 32
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    lens = jnp.array([T], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), feats, lens, train=False)

    pad = jnp.concatenate([feats, jnp.zeros((B, 24, F))], axis=1)
    lp1, n1 = model.apply(variables, feats, lens, train=False)
    lp2, n2 = model.apply(variables, pad, lens, train=False)
    assert int(n1[0]) == int(n2[0])
    n = int(n1[0])
    np.testing.assert_allclose(np.asarray(lp1)[0, :n],
                               np.asarray(lp2)[0, :n], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", [
    n if n == "capsnet" else pytest.param(n, marks=pytest.mark.slow)
    for n in SMALL])
def test_grad_flow(name):
    C = 5
    model = SMALL[name](C)
    B, T, F = 2, 40, 32
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    lens = jnp.array([T, T - 13], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), feats, lens, train=False)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    labels = jnp.array([[1, 2, 3], [2, 1, 0]], jnp.int32)
    label_lens = jnp.array([3, 2], jnp.int32)

    def loss_fn(p):
        (logp, out_lens), _ = model.apply(
            {"params": p, **other}, feats, lens, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.mean(ctc_loss(logp, labels, out_lens, label_lens))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_registry():
    m = create_model("resnet_ctc", num_classes=10)
    assert isinstance(m, ResNetCTC)
    with pytest.raises(KeyError):
        create_model("nope", num_classes=3)


@pytest.mark.parametrize("name", [
    pytest.param("deepspeech", marks=pytest.mark.slow), "resnet"])
def test_tiny_overfit(name):
    """A few steps of Adam on one batch must reduce CTC loss substantially."""
    C = 6
    model = SMALL[name](C)
    B, T, F = 2, 32, 32
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    lens = jnp.full((B,), T, jnp.int32)
    labels = jnp.array([[1, 2, 3, 4], [4, 3, 2, 1]], jnp.int32)
    label_lens = jnp.full((B,), 4, jnp.int32)

    variables = model.init(jax.random.PRNGKey(1), feats, lens, train=False)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            (logp, out_lens), updates = model.apply(
                {"params": p, **other}, feats, lens, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.mean(ctc_loss(logp, labels, out_lens, label_lens))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_deepspeech_pallas_time_major_matches_plain():
    """pallas_gru=True runs the RNN stack time-major with in-kernel reverse
    (no reverse_sequences); it must match the batch-major lax.scan path on
    ragged rows (fwd, eval mode)."""
    from jax.experimental.pallas import tpu as pltpu

    C = 7
    kw = dict(num_classes=C, rnn_hidden=16, rnn_layers=2, conv_channels=4)
    plain = DeepSpeechCTC(**kw)
    pallas = DeepSpeechCTC(**kw, pallas_gru=True, fused_proj=True)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 32))
    lens = jnp.array([40, 27], jnp.int32)
    v = plain.init(jax.random.PRNGKey(1), feats, lens, train=False)
    logp_p, ol_p = plain.apply(v, feats, lens, train=False)
    with pltpu.force_tpu_interpret_mode():
        logp_k, ol_k = pallas.apply(v, feats, lens, train=False)
    np.testing.assert_array_equal(np.asarray(ol_p), np.asarray(ol_k))
    np.testing.assert_allclose(np.asarray(logp_k), np.asarray(logp_p),
                               rtol=1e-4, atol=1e-5)


def test_matmul_frontend_parity():
    """FrontConv's matmul formulation (VERDICT r2 item 5) must match the
    sliding conv through the whole model with SHARED params (checkpoint
    interchangeability) — both SAME and explicit padding."""
    import jax
    import jax.numpy as jnp

    from tpuasr.models import create_model
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 50, 64)), jnp.float32)
    flens = jnp.array([50, 37], jnp.int32)
    for pad in (False, True):
        kw = dict(num_classes=12, rnn_hidden=32, rnn_layers=1,
                  conv_channels=8, explicit_pad=pad)
        m1 = create_model("deepspeech_ctc", **kw)
        m2 = create_model("deepspeech_ctc", matmul_frontend=True, **kw)
        v = m1.init(jax.random.PRNGKey(0), feats, flens, train=False)
        a, la = m1.apply(v, feats, flens, train=False)
        b, lb = m2.apply(v, feats, flens, train=False)
        assert bool((la == lb).all())
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4
