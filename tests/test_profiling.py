"""Profiling utilities: timers and RTF breakdown shape."""

import jax.numpy as jnp

from tpuasr.utils.profiling import rtf_breakdown, time_fn


def test_time_fn():
    f = lambda x: x * 2.0
    t = time_fn(f, jnp.ones((8, 8)), iters=3)
    assert t > 0


def test_rtf_breakdown_keys():
    feat = lambda w, l: (w[:, :, None] * jnp.ones((1, 1, 4)), l)
    am = lambda f, fl: (f * 2.0, fl)
    dec = lambda lp, ol: jnp.argmax(lp, -1)
    wav = jnp.ones((2, 100))
    lens = jnp.array([100, 80])
    bd = rtf_breakdown(feat, am, dec, wav, lens, audio_seconds=1.0, iters=2)
    for k in ("featurizer", "am", "decode", "e2e"):
        assert bd[k]["seconds"] > 0
        assert bd[k]["x_realtime"] > 0
