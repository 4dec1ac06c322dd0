"""Streaming recognizer == offline forward on the unidirectional model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.models import create_model
from tpuasr.serve import StreamingRecognizer


@pytest.fixture(scope="module")
def setup():
    fc = FeatureConfig(n_mels=32, cmn=False, cvn=False)
    model = create_model("deepspeech_ctc", num_classes=6,
                         bidirectional=False, explicit_pad=True,
                         rnn_hidden=16, rnn_layers=2, conv_channels=4,
                         dropout=0.0)
    wav = np.asarray(
        np.sin(2 * np.pi * 700 * np.arange(24000) / 8000)
        + 0.1 * np.random.default_rng(0).standard_normal(24000),
        np.float32)
    fz = Featurizer(fc)
    feats, flens = fz(wav[None], np.array([len(wav)], np.int32))
    variables = model.init(jax.random.PRNGKey(0), feats, flens, train=False)
    return fc, model, variables, wav, feats, flens


def offline_tokens(model, variables, feats, flens, blank=0):
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    ids = np.asarray(jnp.argmax(logp, -1))[0][:int(out_lens[0])]
    out, prev = [], blank
    for t in ids:
        t = int(t)
        if t != blank and t != prev:
            out.append(t)
        prev = t
    return out, np.asarray(logp)[0, :int(out_lens[0])]


@pytest.mark.parametrize("chunk", [
    pytest.param(c, marks=pytest.mark.slow) if c != 1777 else c
    for c in (1600, 1777, 4000, 24000)])
def test_streaming_matches_offline(setup, chunk):
    fc, model, variables, wav, feats, flens = setup
    ref_tokens, ref_logp = offline_tokens(model, variables, feats, flens)

    sr = StreamingRecognizer(variables, fc)
    got = []
    for s in range(0, len(wav), chunk):
        got.extend(sr.feed(wav[s:s + chunk]))
    got.extend(sr.flush())
    assert got == ref_tokens, (chunk, got, ref_tokens)


def test_streaming_rejects_cmvn(setup):
    fc, model, variables, *_ = setup
    with pytest.raises(ValueError, match="cmn"):
        StreamingRecognizer(variables, FeatureConfig(n_mels=32))


def test_reset_reuses(setup):
    fc, model, variables, wav, feats, flens = setup
    ref_tokens, _ = offline_tokens(model, variables, feats, flens)
    sr = StreamingRecognizer(variables, fc)
    sr.feed(wav)
    sr.flush()
    first = list(sr.tokens)
    sr.reset()
    sr.feed(wav)
    sr.flush()
    assert sr.tokens == first == ref_tokens


@pytest.mark.parametrize("chunk", [
    pytest.param(1777, marks=pytest.mark.slow),
    pytest.param(24000, marks=pytest.mark.slow)])
def test_streaming_beam_matches_offline_beam(setup, chunk):
    """Resumable beam state across chunks == one-shot beam on full logp."""
    from tpuasr.decode import BeamSearchConfig, ctc_beam_search
    fc, model, variables, wav, feats, flens = setup
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    cfg = BeamSearchConfig(beam_width=8, class_topk=5)
    ref = ctc_beam_search(logp, out_lens, cfg)
    n = int(ref["token_lens"][0, 0])
    ref_tokens = np.asarray(ref["tokens"])[0, 0, :n].tolist()

    sr = StreamingRecognizer(variables, fc, decode="beam", beam_cfg=cfg)
    for s in range(0, len(wav), chunk):
        sr.feed(wav[s:s + chunk])
    sr.flush()
    assert sr.tokens == ref_tokens


@pytest.mark.parametrize("chunk", [
    1777, pytest.param(24000, marks=pytest.mark.slow)])
def test_streaming_fused_lm_matches_offline(setup, chunk):
    """Chunked beam decoding WITH on-device LM fusion == one-shot fused
    beam on the full logp (the LM score and (last2,last) context ride the
    resumable state)."""
    from tpuasr.decode import BeamSearchConfig, ctc_beam_search
    from tpuasr.lm import train_ngram
    fc, model, variables, wav, feats, flens = setup
    syms = ["<blk>"] + [f"t{i}" for i in range(1, 6)]
    lm = train_ngram([["t1", "t2"], ["t3", "t1", "t4"]] * 4, order=2)
    bigram = lm.fusion_matrix(syms, blank=0)
    eos = lm.eos_vector(syms)
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    cfg = BeamSearchConfig(beam_width=8, class_topk=5, lm_weight=0.7)
    ref = ctc_beam_search(logp, out_lens, cfg, lm_bigram=bigram,
                          lm_eos=eos)
    n = int(ref["token_lens"][0, 0])
    ref_tokens = np.asarray(ref["tokens"])[0, 0, :n].tolist()

    sr = StreamingRecognizer(variables, fc, decode="beam", beam_cfg=cfg,
                             lm_bigram=bigram, lm_eos=eos)
    for s in range(0, len(wav), chunk):
        sr.feed(wav[s:s + chunk])
    sr.flush()
    assert sr.tokens == ref_tokens


def _toy_graph_tables(num_classes=6):
    """Small LG over classes 1..5 (homophone-free) for streaming tests."""
    from tpuasr.decode import (compile_graph_tables, compose,
                               lexicon_to_fst, ngram_to_fst)
    from tpuasr.lm import train_ngram
    prons = [("a", (1, 2)), ("b", (3,)), ("c", (4, 5)), ("d", (2, 1))]
    lm = train_ngram([["a", "b"], ["b", "c", "a"], ["d", "a"],
                      ["c", "d"]], order=2)
    lg = compose(lexicon_to_fst(prons),
                 ngram_to_fst(lm, {w: i + 1
                                   for i, (w, _) in enumerate(prons)}))
    return compile_graph_tables(lg, num_classes)


@pytest.mark.parametrize("chunk", [
    1777, pytest.param(24000, marks=pytest.mark.slow)])
def test_streaming_graph_matches_offline(setup, chunk):
    """Chunked graph-constrained beam == one-shot graph beam on the full
    logp: the per-beam graph state/cost ride the resumable carry across
    chunk boundaries (the streaming latgen analog; VERDICT r4 next #3)."""
    from tpuasr.decode import BeamSearchConfig, ctc_beam_search
    fc, model, variables, wav, feats, flens = setup
    tabs = _toy_graph_tables()
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    cfg = BeamSearchConfig(beam_width=8, class_topk=5, graph_weight=0.8)
    ref = ctc_beam_search(logp, out_lens, cfg, graph=tabs)
    n = int(ref["token_lens"][0, 0])
    ref_tokens = np.asarray(ref["tokens"])[0, 0, :n].tolist()

    sr = StreamingRecognizer(variables, fc, decode="beam", beam_cfg=cfg,
                             graph=tabs)
    for s in range(0, len(wav), chunk):
        sr.feed(wav[s:s + chunk])
    sr.flush()
    assert sr.tokens == ref_tokens


def test_streaming_graph_requires_beam(setup):
    fc, model, variables, *_ = setup
    with pytest.raises(ValueError, match="beam"):
        StreamingRecognizer(variables, fc, graph=_toy_graph_tables())


def test_batched_fused_graph_matches_solo(setup):
    """Regular lockstep graph-beam ticks take the fused one-program path
    (graph tables threaded as jit arguments); hypotheses must equal solo,
    including after a mid-stream re-attach (graph state reset to start)."""
    from tpuasr.decode import BeamSearchConfig
    from tpuasr.serve.streaming import BatchedStreamingRecognizer
    fc, model, variables, wav, feats, flens = setup
    rng = np.random.default_rng(13)
    wavs = [wav,
            np.asarray(0.4 * np.sin(2 * np.pi * 900 * np.arange(len(wav))
                                    / 8000)
                       + 0.1 * rng.standard_normal(len(wav)), np.float32)]
    tabs = _toy_graph_tables()
    cfg = BeamSearchConfig(beam_width=4, class_topk=4, graph_weight=0.8)

    solos = []
    for w in wavs:
        sr = StreamingRecognizer(variables, fc, decode="beam",
                                 beam_cfg=cfg, graph=tabs)
        for s in range(0, len(w), 1600):
            sr.feed(w[s:s + 1600])
        sr.flush()
        solos.append(list(sr.tokens))

    bat = BatchedStreamingRecognizer(variables, fc, n_streams=2,
                                     decode="beam", beam_cfg=cfg,
                                     graph=tabs)
    for s in range(0, len(wav), 1600):
        bat.feed({i: wavs[i][s:s + 1600] for i in range(2)})
    assert bat._fstate is not None      # fused path ran
    for i in range(2):
        bat.flush(i)
    assert bat.tokens == solos, (bat.tokens, solos)
    # Mid-stream re-attach: slot 0 restarts; its graph state must reset to
    # the start state and the restarted stream must match a fresh solo.
    bat.attach(0)
    for s in range(0, len(wavs[0]), 1600):
        bat.feed({0: wavs[0][s:s + 1600]})
    toks0 = bat.flush(0)
    assert toks0 == solos[0]


@pytest.mark.slow
def test_batched_streaming_matches_solo(setup):
    """3 concurrent slots, different audio, == per-slot solo recognizers."""
    from tpuasr.serve.streaming import BatchedStreamingRecognizer
    fc, model, variables, wav, feats, flens = setup
    rng = np.random.default_rng(3)
    wavs = [wav,
            np.asarray(np.sin(2 * np.pi * 1200 * np.arange(16000) / 8000)
                       + 0.1 * rng.standard_normal(16000), np.float32),
            wav[:8000]]

    solos = []
    for w in wavs:
        sr = StreamingRecognizer(variables, fc)
        sr.feed(w)
        sr.flush()
        solos.append(list(sr.tokens))

    bat = BatchedStreamingRecognizer(variables, fc, n_streams=3)
    chunk = 2000
    maxlen = max(len(w) for w in wavs)
    for s in range(0, maxlen, chunk):
        tick = {}
        for i, w in enumerate(wavs):
            if s < len(w):
                tick[i] = w[s:s + chunk]
            elif bat.active[i]:
                bat.flush(i)
        if tick:
            bat.feed(tick)
    for i in range(3):
        if bat.active[i]:
            bat.flush(i)
    assert bat.tokens == solos, (bat.tokens, solos)


def test_greedy_token_frames(setup):
    """token_frames = the offline greedy emission frame of each token."""
    fc, model, variables, wav, feats, flens = setup
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    ids = np.asarray(jnp.argmax(logp, -1))[0][:int(out_lens[0])]
    ref_frames, prev = [], 0
    for t, i in enumerate(ids):
        i = int(i)
        if i != 0 and i != prev:
            ref_frames.append(t)
        prev = i
    sr = StreamingRecognizer(variables, fc)
    for s in range(0, len(wav), 1777):
        sr.feed(wav[s:s + 1777])
    sr.flush()
    assert sr.token_frames == ref_frames
    assert len(sr.token_frames) == len(sr.tokens)
    assert sr.frame_seconds == pytest.approx(
        2.0 * fc.hop_length / fc.sample_rate)


def test_beam_keep_logp_aligns(setup):
    """keep_logp history == offline logp; forced alignment spans cover it."""
    from tpuasr.decode import BeamSearchConfig
    from tpuasr.losses import ctc_align
    fc, model, variables, wav, feats, flens = setup
    _, ref_logp = offline_tokens(model, variables, feats, flens)
    sr = StreamingRecognizer(variables, fc, decode="beam",
                             beam_cfg=BeamSearchConfig(beam_width=4,
                                                       class_topk=4),
                             keep_logp=True)
    sr.feed(wav)
    sr.flush()
    hist = np.concatenate(sr.logp_history, axis=0)
    T = min(len(hist), len(ref_logp))
    np.testing.assert_allclose(hist[:T], ref_logp[:T], atol=1e-5)
    if sr.tokens:
        lab = np.asarray(sr.tokens, np.int32)
        al = ctc_align(jnp.asarray(hist)[None], jnp.asarray(lab)[None],
                       jnp.asarray([len(hist)], np.int32),
                       jnp.asarray([len(lab)], np.int32))
        assert bool(al["feasible"][0])


@pytest.mark.parametrize("with_lm", [False, True])
@pytest.mark.slow
def test_batched_streaming_beam_matches_solo(setup, with_lm):
    """Batched lockstep beam (+ LM fusion) == per-slot solo beam, including
    early flush of a short slot and slot reattachment."""
    from tpuasr.decode import BeamSearchConfig
    from tpuasr.serve.streaming import BatchedStreamingRecognizer
    fc, model, variables, wav, feats, flens = setup
    rng = np.random.default_rng(7)
    wavs = [wav,
            np.asarray(np.sin(2 * np.pi * 1400 * np.arange(16000) / 8000)
                       + 0.1 * rng.standard_normal(16000), np.float32),
            wav[:8000]]
    cfg = BeamSearchConfig(beam_width=4, class_topk=4,
                           lm_weight=0.3 if with_lm else 0.0)
    kw = {}
    if with_lm:
        from tpuasr.lm import train_ngram
        syms = [str(i) for i in range(6)]
        lm = train_ngram([["1", "2", "3"], ["2", "3", "4"],
                          ["3", "4", "5"]], order=2)
        kw = dict(lm_bigram=lm.fusion_matrix(syms),
                  lm_eos=lm.eos_vector(syms))

    def solo_run(w):
        sr = StreamingRecognizer(variables, fc, decode="beam",
                                 beam_cfg=cfg, **kw)
        for s in range(0, len(w), 2000):
            sr.feed(w[s:s + 2000])
        sr.flush()
        return list(sr.tokens)

    solos = [solo_run(w) for w in wavs]

    bat = BatchedStreamingRecognizer(variables, fc, n_streams=3,
                                     decode="beam", beam_cfg=cfg, **kw)
    chunk = 2000
    maxlen = max(len(w) for w in wavs)
    for s in range(0, maxlen, chunk):
        tick = {}
        for i, w in enumerate(wavs):
            if s < len(w):
                tick[i] = w[s:s + chunk]
            elif bat.active[i]:
                bat.flush(i)
        if tick:
            bat.feed(tick)
    for i in range(3):
        if bat.active[i]:
            bat.flush(i)
    assert bat.tokens == solos, (bat.tokens, solos)

    # Reattach the short slot with different audio: fresh beam state.
    bat.attach(2)
    w2 = wavs[1][:8000]
    for s in range(0, len(w2), chunk):
        bat.feed({2: w2[s:s + chunk]})
    got = bat.flush(2)
    assert got == solo_run(w2)


def test_batched_fused_tick_matches_solo(setup):
    """Regular lockstep (equal chunks, all slots) takes the fused
    one-program tick; tokens must equal per-slot solo recognizers."""
    from tpuasr.serve.streaming import BatchedStreamingRecognizer
    fc, model, variables, wav, feats, flens = setup
    rng = np.random.default_rng(7)
    wavs = [wav,
            np.asarray(0.5 * np.sin(2 * np.pi * 700 * np.arange(len(wav))
                                    / 8000)
                       + 0.1 * rng.standard_normal(len(wav)), np.float32),
            np.asarray(0.2 * rng.standard_normal(len(wav)), np.float32)]

    solos = []
    for w in wavs:
        sr = StreamingRecognizer(variables, fc)
        sr.feed(w)
        sr.flush()
        solos.append(list(sr.tokens))

    bat = BatchedStreamingRecognizer(variables, fc, n_streams=3)
    chunk = 1600
    for s in range(0, len(wav), chunk):
        bat.feed({i: wavs[i][s:s + chunk] for i in range(3)})
    assert bat._fstate is not None      # the fused path actually ran
    for i in range(3):
        bat.flush(i)
    assert bat.tokens == solos, (bat.tokens, solos)


@pytest.mark.parametrize("with_lm", [False, True])
def test_batched_fused_beam_matches_solo(setup, with_lm):
    """Regular lockstep beam ticks take the fused one-program path (AM +
    resumable search in one jit); hypotheses must equal solo beam."""
    from tpuasr.decode import BeamSearchConfig
    from tpuasr.serve.streaming import BatchedStreamingRecognizer
    fc, model, variables, wav, feats, flens = setup
    rng = np.random.default_rng(11)
    wavs = [wav,
            np.asarray(0.4 * np.sin(2 * np.pi * 900 * np.arange(len(wav))
                                    / 8000)
                       + 0.1 * rng.standard_normal(len(wav)), np.float32)]
    cfg = BeamSearchConfig(beam_width=4, class_topk=4,
                           lm_weight=0.3 if with_lm else 0.0)
    kw = {}
    if with_lm:
        from tpuasr.lm import train_ngram
        syms = [str(i) for i in range(6)]
        lm = train_ngram([["1", "2", "3"], ["2", "3", "4"],
                          ["3", "4", "5"]], order=2)
        kw = dict(lm_bigram=lm.fusion_matrix(syms),
                  lm_eos=lm.eos_vector(syms))

    solos = []
    for w in wavs:
        sr = StreamingRecognizer(variables, fc, decode="beam",
                                 beam_cfg=cfg, **kw)
        for s in range(0, len(w), 1600):
            sr.feed(w[s:s + 1600])
        sr.flush()
        solos.append(list(sr.tokens))

    bat = BatchedStreamingRecognizer(variables, fc, n_streams=2,
                                     decode="beam", beam_cfg=cfg, **kw)
    for s in range(0, len(wav), 1600):
        bat.feed({i: wavs[i][s:s + 1600] for i in range(2)})
    assert bat._fstate is not None      # fused path ran
    for i in range(2):
        bat.flush(i)
    assert bat.tokens == solos, (bat.tokens, solos)
