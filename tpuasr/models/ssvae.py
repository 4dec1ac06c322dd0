"""Semi-supervised VAE acoustic classifier (reference: asr/models/ssvae/ [M],
SURVEY.md sections 2.1/3.5 — a Pyro SVI adaptation of the M2 ss-vae for
frame-wise phone classification, alternating supervised and unsupervised
batches).

Rebuilt without Pyro: the M2 objective (Kingma et al. 2014) in plain
flax/optax —

  supervised:    L = -E_q(z|x,y)[log p(x|y,z)] + KL(q(z|x,y) || p(z))
                     - log p(y)  (+ alpha * CE(q(y|x), y))
  unsupervised:  U = sum_y q(y|x) [ L(x, y) ] - H(q(y|x))

Inputs are spliced frames (FeatureConfig.splice_*), matching the reference's
frame-wise usage; the classifier head doubles as a frame-wise AM.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    features: tuple
    out: int

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc{i}")(x)
            x = nn.softplus(x)
        return nn.Dense(self.out, name="out")(x)


class SSVAE(nn.Module):
    """M2 model over frame vectors x (B, D) with C phone classes."""

    num_classes: int
    latent_dim: int = 32
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, x, y_onehot, z_rng):
        """Returns dict with classifier logits, reconstruction, KL."""
        C, Z = self.num_classes, self.latent_dim
        logits = MLP(self.hidden, C, name="classifier")(x)
        h = jnp.concatenate([x, y_onehot], axis=-1)
        enc_out = MLP(self.hidden, 2 * Z, name="encoder")(h)
        mu, logvar = enc_out[:, :Z], jnp.clip(enc_out[:, Z:], -8.0, 8.0)
        eps = jax.random.normal(z_rng, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
        dec_in = jnp.concatenate([y_onehot, z], axis=-1)
        x_mu = MLP(self.hidden, x.shape[-1], name="decoder")(dec_in)
        # -log p(x | y, z) under unit-variance Gaussian (up to const).
        rec = 0.5 * jnp.sum((x - x_mu) ** 2, axis=-1)
        kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu ** 2 - 1.0 - logvar, axis=-1)
        return dict(logits=logits, rec=rec, kl=kl, x_mu=x_mu)


class SSVAEAM(nn.Module):
    """AM-interface adapter: per-frame classifier head of the SSVAE over
    (optionally spliced) feature frames — (B, T, F) -> (B, T, C) log-probs,
    out_lens = feat_lens (no time downsampling). Registered as the "ssvae"
    model so the standard Trainer (framewise_ce objective) and predict/test
    CLIs can drive it; the semi-supervised ELBO path uses SSVAE/SSVAELoss
    directly.
    """

    num_classes: int
    latent_dim: int = 32
    hidden: tuple = (256, 256)

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False):
        B, T, F = feats.shape
        x = feats.reshape(B * T, F)
        ssvae = SSVAE(num_classes=self.num_classes,
                      latent_dim=self.latent_dim, hidden=self.hidden,
                      name="ssvae")
        rng = (self.make_rng("latent") if self.has_rng("latent")
               else jax.random.PRNGKey(0))
        out = ssvae(x, jnp.zeros((B * T, self.num_classes)), rng)
        logp = jax.nn.log_softmax(out["logits"], -1).reshape(B, T, -1)
        mask = (jnp.arange(T)[None, :] < feat_lens[:, None])
        logp = jnp.where(mask[:, :, None], logp, 0.0)
        return logp, feat_lens


@dataclasses.dataclass(frozen=True)
class SSVAELoss:
    num_classes: int
    alpha: float = 1.0        # supervised classifier weight

    def supervised_frames(self, model, variables, x, y, rng):
        """Per-frame supervised loss L(x, y) + alpha*CE — (N,)."""
        y1 = jax.nn.one_hot(y, self.num_classes)
        out = model.apply(variables, x, y1, rng)
        log_py = -jnp.log(float(self.num_classes))  # uniform prior over y
        elbo_neg = out["rec"] + out["kl"] - log_py
        ce = -jnp.take_along_axis(
            jax.nn.log_softmax(out["logits"], -1), y[:, None], axis=1)[:, 0]
        return elbo_neg + self.alpha * ce, out["logits"]

    def unsupervised_frames(self, model, variables, x, rng):
        """Per-frame unsupervised loss U(x) (y enumerated) — (N,)."""
        C = self.num_classes
        B = x.shape[0]
        # q(y|x) from the classifier; enumerate all y (C small for phones).
        logits = model.apply(variables, x, jnp.zeros((B, C)), rng)["logits"]
        q_y = jax.nn.softmax(logits, -1)                      # (B, C)
        log_q_y = jax.nn.log_softmax(logits, -1)

        def neg_elbo_for(y_idx):
            y1 = jax.nn.one_hot(jnp.full((B,), y_idx), C)
            out = model.apply(variables, x, y1, jax.random.fold_in(rng, y_idx))
            return out["rec"] + out["kl"] + jnp.log(float(C))

        # Sequential over classes (lax.map) bounds peak memory to one
        # class's activations — C x N x hidden at once would not fit for
        # real batch sizes.
        neg_elbos = jax.lax.map(neg_elbo_for, jnp.arange(C)).T  # (B, C)
        return (jnp.sum(q_y * neg_elbos, axis=1)
                + jnp.sum(q_y * log_q_y, axis=1))

    def supervised(self, model, variables, x, y, rng):
        losses, _ = self.supervised_frames(model, variables, x, y, rng)
        return jnp.mean(losses)

    def unsupervised(self, model, variables, x, rng):
        return jnp.mean(self.unsupervised_frames(model, variables, x, rng))
