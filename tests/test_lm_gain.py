"""End-to-end LM quality gain: on a corpus whose transcripts have n-gram
structure (Markov token chains), a partially-trained AM + the corpus bigram
LM beats the AM alone — via BOTH on-device shallow fusion and host-side
n-best rescoring. This is the quality role the Kaldi grammar (G of TLG)
played in the reference's latgen decode (SURVEY.md section 2.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.data.manifest import read_manifest
from tpuasr.decode import BeamSearchConfig, ctc_beam_search
from tpuasr.features import FeatureConfig
from tpuasr.lm import rescore_nbest, train_ngram
from tpuasr.train import TrainConfig, Trainer
from tpuasr.utils.metrics import wer


@pytest.mark.slow
def test_lm_fusion_and_rescoring_reduce_ter(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=24, vocab_size=6,
                                   min_tokens=3, max_tokens=6,
                                   markov=0.85, noise=0.4, seed=3)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=8, max_label_len=8))
    # Deliberately under-trained: 4 epochs leaves TER ~0.2-0.5 so the LM
    # has real errors to fix (more epochs -> TER ~0 and nothing to show).
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=6,
                      model_kwargs=dict(rnn_hidden=32, rnn_layers=1,
                                        conv_channels=4, dropout=0.0),
                      lr=3e-3, num_epochs=4, warmup_steps=10,
                      log_every=1000)
    tr = Trainer(cfg, FeatureConfig(n_mels=32))
    state = tr.init_state(loader.make_batch(loader.batch_plan(0)[0]))
    for ep in range(cfg.num_epochs):
        loader.epoch = ep
        for b in loader:
            state, _ = tr.train_step(state, tr._device_batch(b))

    utts = read_manifest(corpus.manifest)
    syms = ["<blk>"] + [f"t{i}" for i in range(1, 6)]
    lm = train_ngram([[f"t{t}" for t in u.tokens] for u in utts], order=2)
    bigram = lm.fusion_matrix(syms, blank=0)
    eos = lm.eos_vector(syms)

    ev = AudioLoader(corpus.manifest,
                     LoaderConfig(batch_size=8, max_label_len=8,
                                  shuffle=False))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    refs, h_plain, h_fused, h_resc = [], [], [], []
    c0 = BeamSearchConfig(beam_width=8, class_topk=5, max_len=16)
    c1 = BeamSearchConfig(beam_width=8, class_topk=5, max_len=16,
                          lm_weight=0.5)
    for b in ev:
        feats, flens = tr.featurizer._jit(jnp.asarray(b["wav"]),
                                          jnp.asarray(b["wav_lens"]))
        logp, ol = tr.model.apply(variables, feats, flens, train=False)
        plain = ctc_beam_search(logp, ol, c0)
        fused = ctc_beam_search(logp, ol, c1, lm_bigram=bigram, lm_eos=eos)
        nb = ctc_beam_search(logp, ol, c0, n_best=8)
        sc = rescore_nbest(lm, np.asarray(nb["tokens"]),
                           np.asarray(nb["token_lens"]),
                           np.asarray(nb["scores"]), syms, lm_weight=0.5)
        best = np.argmax(sc, 1)
        for j in range(len(b["real"])):
            if not b["real"][j]:
                continue
            refs.append(b["tokens"][j][:b["token_lens"][j]].tolist())
            for hyps, out, idx in ((h_plain, plain, 0), (h_fused, fused, 0),
                                   (h_resc, nb, int(best[j]))):
                n = int(np.asarray(out["token_lens"])[j, idx])
                hyps.append(np.asarray(out["tokens"])[j, idx, :n].tolist())

    ter_plain = wer(refs, h_plain)
    ter_fused = wer(refs, h_fused)
    ter_resc = wer(refs, h_resc)
    # Calibrated regime (seed 3): plain ~0.24, fused ~0.05, rescored ~0.06.
    assert ter_plain > 0.05, f"AM too good to show LM gain ({ter_plain})"
    assert ter_fused < ter_plain * 0.7, (ter_plain, ter_fused)
    assert ter_resc < ter_plain * 0.7, (ter_plain, ter_resc)
