"""ResNet-ED: dual interface (CTC head + teacher-forced decoder) + learning."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.models import ResNetED, create_model


def small():
    return ResNetED(num_classes=6, stem_channels=8, stage_channels=(8,),
                    blocks_per_stage=1, dec_hidden=16, emb_dim=8,
                    dropout=0.0)


def test_ctc_interface():
    model = small()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 32))
    lens = jnp.array([40, 27], jnp.int32)
    v = model.init(jax.random.PRNGKey(1), feats, lens, train=False)
    logp, out_lens = model.apply(v, feats, lens, train=False)
    assert logp.shape[-1] == 6
    np.testing.assert_allclose(np.exp(np.asarray(logp))[0].sum(-1), 1.0,
                               rtol=1e-4)


def test_seq2seq_interface_and_learning():
    model = small()
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 32))
    lens = jnp.array([40, 40], jnp.int32)
    labels = jnp.array([[1, 2, 3], [3, 2, 1]], jnp.int32)
    labels_in = jnp.concatenate(
        [jnp.zeros_like(labels[:, :1]), labels[:, :-1]], axis=1)
    llens = jnp.array([3, 3], jnp.int32)
    v = model.init(jax.random.PRNGKey(1), feats, lens, train=False,
                   labels_in=labels_in, label_lens=llens)
    # The CTC-head params must also exist (shared init via both paths).
    v2 = model.init(jax.random.PRNGKey(1), feats, lens, train=False)
    logits, out_lens = model.apply(v, feats, lens, train=False,
                                   labels_in=labels_in, label_lens=llens)
    assert logits.shape == (2, 3, 6)

    # A few teacher-forcing CE steps reduce loss.
    import optax
    opt = optax.adam(1e-2)
    params = v["params"]
    other = {k: x for k, x in v.items() if k != "params"}
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def f(p):
            (lg, _), _ = model.apply(
                {"params": p, **other}, feats, lens, train=True,
                labels_in=labels_in, label_lens=llens,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            lsm = jax.nn.log_softmax(lg, -1)
            return -jnp.mean(jnp.take_along_axis(
                lsm, labels[:, :, None], axis=2))
        loss, g = jax.value_and_grad(f)(params)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_registry():
    m = create_model("resnet_ed", num_classes=5)
    assert isinstance(m, ResNetED)
