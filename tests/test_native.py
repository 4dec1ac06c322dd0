"""Native C++ host library: build, greedy/edit-distance parity, and the host
beam search as an independent oracle for the device beam search."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr import native
from tpuasr.decode import BeamSearchConfig, ctc_beam_search, greedy_decode
from tpuasr.utils.metrics import edit_distance

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_edit_distance_matches_python(rng):
    for _ in range(20):
        a = rng.integers(0, 5, size=rng.integers(0, 12)).astype(np.int32)
        b = rng.integers(0, 5, size=rng.integers(0, 12)).astype(np.int32)
        assert native.edit_distance_host(a, b) == edit_distance(
            a.tolist(), b.tolist())


def test_greedy_matches_device(rng):
    B, T, C = 4, 30, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = np.array([T, T - 5, T - 10, 3], np.int32)
    ht, hl = native.ctc_greedy_host(lp, lens)
    dt, dl = greedy_decode(jnp.asarray(lp), jnp.asarray(lens))
    np.testing.assert_array_equal(hl, np.asarray(dl))
    for b in range(B):
        np.testing.assert_array_equal(ht[b, :hl[b]],
                                      np.asarray(dt)[b, :dl[b]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_beam_matches_device_beam(rng, seed):
    """Two independent implementations (hash-merge device scan vs exact
    C++ map-merge) must agree on wide-beam small problems."""
    r = np.random.default_rng(seed)
    B, T, C = 2, 8, 5
    logits = (r.standard_normal((B, T, C)) * 2).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = np.array([T, T - 2], np.int32)
    host = native.ctc_beam_search_host(lp, lens, beam_width=64,
                                       class_topk=C - 1, max_len=T)
    cfg = BeamSearchConfig(beam_width=64, class_topk=C - 1, max_len=T)
    dev = ctc_beam_search(jnp.asarray(lp), jnp.asarray(lens), cfg)
    for b in range(B):
        n_h = int(host["token_lens"][b])
        n_d = int(np.asarray(dev["token_lens"])[b, 0])
        assert n_h == n_d
        np.testing.assert_array_equal(
            host["tokens"][b, :n_h], np.asarray(dev["tokens"])[b, 0, :n_d])
        np.testing.assert_allclose(host["scores"][b],
                                   float(dev["scores"][b, 0]), rtol=1e-4)
