"""On-device SpecAugment (Park et al., 2019, arXiv:1904.08779).

The reference predates SpecAugment and has no augmentation beyond feature
dither; a production training framework needs it, and on TPU the right
place is ON DEVICE inside the jitted train step — the masks are built from
iota comparisons (static shapes, no dynamic slicing), so the whole thing
fuses into the featurizer's elementwise epilogue instead of adding host
work to the input pipeline.

Applied by Trainer._loss_fn when TrainConfig.spec_augment is set (train
only — eval always sees clean features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(feats, flens, rng, *, freq_masks: int = 2,
                 freq_width: int = 12, time_masks: int = 2,
                 time_frac: float = 0.05):
    """feats (B, T, F), flens (B,) -> masked feats (same shape/dtype).

    Per utterance: ``freq_masks`` random frequency bands of width
    U{0..freq_width}, and ``time_masks`` random time spans of length
    U{0..time_frac * flens[b]} placed INSIDE the valid region (padding is
    already zero and stays untouched). Masked cells are set to zero — the
    features are log-mel with per-utterance CMVN, so zero is the mean.
    """
    B, T, F = feats.shape
    f_iota = jnp.arange(F)[None, None, :]          # (1, 1, F)
    t_iota = jnp.arange(T)[None, :, None]          # (1, T, 1)
    keep = jnp.ones((B, T, F), bool)
    for i in range(freq_masks):
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 2 * i))
        w = jax.random.randint(k1, (B, 1, 1), 0, freq_width + 1)
        f0 = (jax.random.uniform(k2, (B, 1, 1))
              * jnp.maximum(F - w, 1)).astype(jnp.int32)
        keep &= ~((f_iota >= f0) & (f_iota < f0 + w))
    for i in range(time_masks):
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 2 * i + 1))
        max_w = (time_frac * flens).astype(jnp.int32)[:, None, None]
        w = (jax.random.uniform(k1, (B, 1, 1))
             * (max_w + 1)).astype(jnp.int32)
        span = jnp.maximum(flens[:, None, None] - w, 1)
        t0 = (jax.random.uniform(k2, (B, 1, 1)) * span).astype(jnp.int32)
        keep &= ~((t_iota >= t0) & (t_iota < t0 + w))
    return feats * keep.astype(feats.dtype)
