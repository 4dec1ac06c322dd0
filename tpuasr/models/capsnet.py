"""Capsule-network acoustic model with dynamic routing (reference:
asr/models/capsule1/ [M], SURVEY.md section 2.1 — capsule layers with
routing-by-agreement iterations and squash nonlinearity as the acoustic
classifier; BASELINE config #4).

TPU-first design: routing-by-agreement is matmul-heavy (prediction vectors
u_hat = W u are one big einsum on the MXU) and the routing loop is a
fixed-iteration ``lax.fori_loop`` with softmax/squash in fp32 — no
data-dependent control flow. The model emits per-frame class-capsule lengths
as logits, so it can be CTC-trained like the other AMs or used frame-wise
with the margin loss (reference style).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuasr.models.layers import conv_out_length, sequence_mask


def squash(s, axis=-1, eps=1e-8):
    """v = |s|^2/(1+|s|^2) * s/|s| — capsule nonlinearity, fp32."""
    s32 = s.astype(jnp.float32)
    sq = jnp.sum(s32 * s32, axis=axis, keepdims=True)
    scale = sq / (1.0 + sq) * jax.lax.rsqrt(sq + eps)
    return (scale * s32).astype(s.dtype)


def dynamic_routing(u_hat, num_iters: int = 3):
    """Routing-by-agreement.

    u_hat: (..., N_in, N_out, D_out) prediction vectors.
    Returns v: (..., N_out, D_out).
    """
    b_shape = u_hat.shape[:-1]            # (..., N_in, N_out)
    b0 = jnp.zeros(b_shape, jnp.float32)
    u32 = u_hat.astype(jnp.float32)
    u_stop = jax.lax.stop_gradient(u32)

    def iter_body(i, b):
        c = jax.nn.softmax(b, axis=-1)    # over N_out
        s = jnp.sum(c[..., None] * u_stop, axis=-3)
        v = squash(s)
        return b + jnp.sum(u_stop * v[..., None, :, :], axis=-1)

    b = jax.lax.fori_loop(0, num_iters - 1, iter_body, b0)
    # Final iteration with gradient flow.
    c = jax.nn.softmax(b, axis=-1)
    s = jnp.sum(c[..., None] * u32, axis=-3)
    return squash(s)


class CapsNetCTC(nn.Module):
    num_classes: int
    conv_channels: int = 64
    primary_caps: int = 16     # number of primary capsule types
    primary_dim: int = 8
    class_dim: int = 16
    routing_iters: int = 3
    time_stride: int = 2
    # Fused Pallas routing (ops/pallas_routing.py): u_hat computed and
    # routed entirely in VMEM — never materialized in HBM. Numerically
    # equal to the einsum + dynamic_routing path up to f32 summation
    # order; same gradient semantics (stop-gradient iterations).
    pallas_routing: bool = False

    @nn.compact
    def __call__(self, feats, feat_lens, train: bool = False):
        # (B, T, F) -> NHWC
        x = feats[:, :, :, None]
        x = nn.Conv(self.conv_channels, (5, 9), strides=(self.time_stride, 2),
                    padding="SAME", use_bias=False, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="stem_bn")(x)
        x = nn.relu(x)
        out_lens = conv_out_length(feat_lens, 5, self.time_stride, "SAME")
        # Re-zero padding (BN bias makes zeros nonzero; see ResNetCTC).
        x = x * sequence_mask(out_lens, x.shape[1])[:, :, None, None]

        # Primary capsules: conv -> (B, T', F'', caps*dim) -> (B, T', N_in, D)
        x = nn.Conv(self.primary_caps * self.primary_dim, (3, 9),
                    strides=(1, 2), padding="SAME", name="primary")(x)
        B, Tp, Fp, _ = x.shape
        u = x.reshape(B, Tp, Fp * self.primary_caps, self.primary_dim)
        u = squash(u)

        # Prediction vectors: one einsum over all frames (MXU).
        n_in = Fp * self.primary_caps
        W = self.param("W_route", nn.initializers.lecun_normal(),
                       (n_in, self.primary_dim,
                        self.num_classes * self.class_dim))
        if self.pallas_routing:
            from tpuasr.ops.pallas_routing import routed_caps
            v = routed_caps(u, W, self.num_classes, self.class_dim,
                            self.routing_iters)           # (B, T', C, D)
        else:
            u_hat = jnp.einsum("btid,idk->btik", u, W,
                               preferred_element_type=jnp.float32)
            u_hat = u_hat.reshape(B, Tp, n_in, self.num_classes,
                                  self.class_dim)
            v = dynamic_routing(u_hat, self.routing_iters)  # (B, T', C, D)
        caps_len = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-8)  # (B, T', C)

        # Capsule lengths in (0,1): scale to usable logits for CTC.
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(10.0), ())
        logits = caps_len * logit_scale
        logp = nn.log_softmax(logits, axis=-1)
        mask = sequence_mask(out_lens, Tp)
        logp = jnp.where(mask[:, :, None], logp, 0.0)
        return logp, out_lens


def margin_loss(caps_len, labels_onehot, m_plus=0.9, m_minus=0.1, lam=0.5):
    """Frame-wise capsule margin loss (reference CapsNet training objective)."""
    pos = jnp.maximum(0.0, m_plus - caps_len) ** 2
    neg = jnp.maximum(0.0, caps_len - m_minus) ** 2
    return jnp.sum(labels_onehot * pos + lam * (1 - labels_onehot) * neg,
                   axis=-1)
