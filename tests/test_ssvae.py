"""SSVAE: objective sanity + semi-supervised learning on separable frames."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpuasr.models.ssvae import SSVAE, SSVAELoss


def make_data(rng, n, C, D, centers=None):
    """Gaussian clusters (same `centers` across splits!)."""
    if centers is None:
        centers = rng.standard_normal((C, D)).astype(np.float32) * 3.0
    y = rng.integers(0, C, size=n)
    x = centers[y] + rng.standard_normal((n, D)).astype(np.float32) * 0.5
    return x.astype(np.float32), y.astype(np.int32), centers


def test_losses_finite_and_grad():
    C, D = 4, 16
    model = SSVAE(num_classes=C, latent_dim=8, hidden=(32,))
    loss = SSVAELoss(num_classes=C)
    rng = np.random.default_rng(0)
    x, y, _ = make_data(rng, 8, C, D)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jax.nn.one_hot(jnp.asarray(y), C),
                           jax.random.PRNGKey(1))
    ls = loss.supervised(model, variables, jnp.asarray(x), jnp.asarray(y),
                         jax.random.PRNGKey(2))
    lu = loss.unsupervised(model, variables, jnp.asarray(x),
                           jax.random.PRNGKey(3))
    assert np.isfinite(float(ls)) and np.isfinite(float(lu))
    g = jax.grad(lambda v: loss.supervised(model, v, jnp.asarray(x),
                                           jnp.asarray(y),
                                           jax.random.PRNGKey(2)))(variables)
    assert all(np.all(np.isfinite(np.asarray(t)))
               for t in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_semi_supervised_learning():
    """Few labels + many unlabeled frames -> classifier beats chance."""
    C, D = 3, 12
    rng = np.random.default_rng(1)
    x_lab, y_lab, centers = make_data(rng, 30, C, D)
    x_unl, _, _ = make_data(rng, 300, C, D, centers)
    x_test, y_test, _ = make_data(rng, 200, C, D, centers)

    model = SSVAE(num_classes=C, latent_dim=8, hidden=(64,))
    loss = SSVAELoss(num_classes=C, alpha=5.0)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_lab),
                           jax.nn.one_hot(jnp.asarray(y_lab), C),
                           jax.random.PRNGKey(1))
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables)

    @jax.jit
    def step(variables, opt_state, key):
        def f(v):
            k1, k2 = jax.random.split(key)
            return (loss.supervised(model, v, jnp.asarray(x_lab),
                                    jnp.asarray(y_lab), k1)
                    + loss.unsupervised(model, v, jnp.asarray(x_unl), k2))
        l, g = jax.value_and_grad(f)(variables)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(variables, up), opt_state, l

    key = jax.random.PRNGKey(42)
    for i in range(150):
        key, sub = jax.random.split(key)
        variables, opt_state, l = step(variables, opt_state, sub)

    logits = model.apply(variables, jnp.asarray(x_test),
                         jnp.zeros((len(x_test), C)),
                         jax.random.PRNGKey(9))["logits"]
    acc = float((jnp.argmax(logits, -1) == jnp.asarray(y_test)).mean())
    assert acc > 0.8, acc
