"""Pallas beam-search kernel vs the XLA scan version (interpreter mode).

The interpreter executes the unrolled K x K merge at python speed, so these
tests keep K small; full-size validation (exhaustive + larger problems) runs
compiled on the TPU (driven in the on-chip verification pass; see also
benchmarks/wer_delta.py which cross-checks decode paths on a trained model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import BeamSearchConfig, ctc_beam_search
from tpuasr.decode.pallas_beam import ctc_beam_search_pallas

needs_interpret = jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode():
    if needs_interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_beam_small(seed):
    """K=4, all classes on both sides -> identical hypotheses and scores."""
    rng = np.random.default_rng(seed)
    B, T, C = 2, 6, 4
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 1.5
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T, T - 2])
    cfg = BeamSearchConfig(beam_width=4, class_topk=C - 1, max_len=T)
    a = ctc_beam_search(lp, lens, cfg, n_best=2)
    b = ctc_beam_search_pallas(lp, lens, cfg, n_best=2)
    for bi in range(B):
        for ni in range(2):
            na = int(a["token_lens"][bi, ni])
            nb = int(b["token_lens"][bi, ni])
            assert na == nb, (bi, ni)
            np.testing.assert_array_equal(
                np.asarray(a["tokens"])[bi, ni, :na],
                np.asarray(b["tokens"])[bi, ni, :nb])
            np.testing.assert_allclose(float(a["scores"][bi, ni]),
                                       float(b["scores"][bi, ni]),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_lm_fusion_matches_xla_beam(seed):
    """Shallow fusion inside the kernel == the XLA scan version."""
    from tpuasr.lm import train_ngram
    rng = np.random.default_rng(seed)
    B, T, C = 2, 6, 4
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"], ["a", "b", "c"], ["b", "a"]] * 3, order=2)
    bigram = lm.fusion_matrix(syms, blank=0)
    eos = lm.eos_vector(syms)
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 1.5
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T, T - 2])
    cfg = BeamSearchConfig(beam_width=4, class_topk=C - 1, max_len=T,
                           lm_weight=0.7)
    a = ctc_beam_search(lp, lens, cfg, n_best=2, lm_bigram=bigram,
                        lm_eos=eos)
    b = ctc_beam_search_pallas(lp, lens, cfg, n_best=2, lm_bigram=bigram,
                               lm_eos=eos)
    for bi in range(B):
        for ni in range(2):
            na = int(a["token_lens"][bi, ni])
            nb = int(b["token_lens"][bi, ni])
            assert na == nb, (bi, ni)
            np.testing.assert_array_equal(
                np.asarray(a["tokens"])[bi, ni, :na],
                np.asarray(b["tokens"])[bi, ni, :nb])
            for key in ("scores", "am_scores", "lm_scores"):
                np.testing.assert_allclose(float(a[key][bi, ni]),
                                           float(b[key][bi, ni]),
                                           rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_trigram_fusion_matches_xla_beam(seed):
    """Full-trigram fusion (two-hot table fetch) == the XLA scan version,
    including the 2-D P(</s> | last2, last) end-of-sentence term."""
    from tpuasr.lm import train_ngram
    rng = np.random.default_rng(seed)
    B, T, C = 2, 7, 4
    syms = ["<blk>", "a", "b", "c"]
    lm = train_ngram([["c", "a"], ["a", "b", "c"], ["b", "a", "a"]] * 3,
                     order=3)
    trigram = lm.fusion_tensor3(syms, blank=0)
    eos = lm.eos_matrix(syms)
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 1.5
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T, T - 3])
    cfg = BeamSearchConfig(beam_width=4, class_topk=C - 1, max_len=T,
                           lm_weight=0.7)
    a = ctc_beam_search(lp, lens, cfg, n_best=2, lm_trigram=trigram,
                        lm_eos=eos)
    b = ctc_beam_search_pallas(lp, lens, cfg, n_best=2, lm_trigram=trigram,
                               lm_eos=eos)
    for bi in range(B):
        for ni in range(2):
            na = int(a["token_lens"][bi, ni])
            nb = int(b["token_lens"][bi, ni])
            assert na == nb, (bi, ni)
            np.testing.assert_array_equal(
                np.asarray(a["tokens"])[bi, ni, :na],
                np.asarray(b["tokens"])[bi, ni, :nb])
            for key in ("scores", "am_scores", "lm_scores"):
                np.testing.assert_allclose(float(a[key][bi, ni]),
                                           float(b[key][bi, ni]),
                                           rtol=1e-4, atol=1e-4)


def test_trigram_table_vmem_gate():
    """Vocabularies whose (C+1)^2 table cannot fit VMEM raise with a
    pointer at the XLA implementation instead of failing in Mosaic."""
    C = 192
    lp = jnp.zeros((1, 4, C))
    tri = np.zeros((C + 1, C + 1, C), np.float32)
    with pytest.raises(ValueError, match="XLA ctc_beam_search"):
        ctc_beam_search_pallas(lp, jnp.array([4]),
                               BeamSearchConfig(beam_width=4),
                               lm_trigram=tri)


def test_respects_lengths(rng):
    T, C = 8, 4
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lp2 = lp.at[0, 5:].set(jnp.log(1.0 / C))
    cfg = BeamSearchConfig(beam_width=4, max_len=T)
    o1 = ctc_beam_search_pallas(lp, jnp.array([5]), cfg)
    o2 = ctc_beam_search_pallas(lp2, jnp.array([5]), cfg)
    np.testing.assert_array_equal(np.asarray(o1["tokens"]),
                                  np.asarray(o2["tokens"]))
    np.testing.assert_allclose(np.asarray(o1["scores"]),
                               np.asarray(o2["scores"]), rtol=1e-6)


def test_lane_slice_variant_matches(monkeypatch):
    """The recorded-negative-result lane-slice path
    (TPUASR_BEAM_LANE_SLICE=1, see the module comment: measured ~10 ms
    slower on chip but semantically identical) must stay correct so the
    A/B remains re-runnable."""
    import tpuasr.decode.pallas_beam as pb

    rng = np.random.default_rng(17)
    B, T, C = 2, 7, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 1.5
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T, T - 3])
    cfg = BeamSearchConfig(beam_width=4, class_topk=C - 1, max_len=T)
    base = ctc_beam_search_pallas(lp, lens, cfg, n_best=2)
    monkeypatch.setattr(pb, "_STATIC_LANE_SLICE", True)
    pb._build.cache_clear()  # kernels are cached per shape, not per flag
    try:
        alt = ctc_beam_search_pallas(lp, lens, cfg, n_best=2)
    finally:
        monkeypatch.setattr(pb, "_STATIC_LANE_SLICE", False)
        pb._build.cache_clear()
    np.testing.assert_array_equal(np.asarray(base["tokens"]),
                                  np.asarray(alt["tokens"]))
    np.testing.assert_allclose(np.asarray(base["scores"]),
                               np.asarray(alt["scores"]), rtol=1e-6)
