#!/usr/bin/env python
"""WER-delta harness (BASELINE north star: <=0.2% absolute WER delta vs the
reference decode). With no readable reference tree (SURVEY.md provenance),
the deltas measurable today are decode-path deltas on a trained model:

  * greedy (device)         vs greedy (C++ host)     — must agree exactly
  * beam XLA (device)       vs beam (C++ host, exact map merge)
  * beam Pallas (TPU default) vs beam XLA            — kernel parity at
    eval scale, not just unit shapes
  * beam vs greedy TER on a held-out set             — beam should be <=
  * LM-fused beam (bigram + trigram, on device) TER  — the TLG-grammar
    analog must HELP on an n-gram-structured corpus

Trains a small DeepSpeech on a noisy Markov-structured tone corpus until it
actually transcribes (imperfectly — the noise level leaves real errors for
the LM to fix), then reports everything in ONE JSON line; --out writes the
same record to a file (the per-round WERDELTA artifact). Re-point at real
ASpIRE data + the PyTorch reference when /root/reference materializes
(benchmarks/rebaseline.py).
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--epochs", type=int, default=14)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuasr import native
    from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
    from tpuasr.decode import (BeamSearchConfig, ctc_beam_search,
                               get_beam_search, greedy_decode)
    from tpuasr.features import FeatureConfig
    from tpuasr.lm import train_ngram
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.metrics import wer

    tmp = Path(tempfile.mkdtemp(prefix="werdelta_"))
    mk = dict(vocab_size=6, min_tokens=2, max_tokens=5, markov=0.85,
              noise=0.35)
    train_c = make_synthetic_corpus(tmp / "train", num_utts=48, seed=11,
                                    **mk)
    eval_c = make_synthetic_corpus(tmp / "eval", num_utts=24, seed=23,
                                   split="eval", **mk)
    lcfg = LoaderConfig(batch_size=8, max_label_len=8)
    train_loader = AudioLoader(train_c.manifest, lcfg)
    eval_loader = AudioLoader(eval_c.manifest,
                              LoaderConfig(batch_size=8, max_label_len=8,
                                           shuffle=False))
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=6,
                      model_kwargs=dict(rnn_hidden=64, rnn_layers=2,
                                        conv_channels=8, dropout=0.0),
                      lr=3e-3, num_epochs=args.epochs, warmup_steps=20,
                      log_every=10 ** 9)
    trainer = Trainer(cfg, FeatureConfig(n_mels=40))
    state = trainer.init_state(
        train_loader.make_batch(train_loader.batch_plan(0)[0]))
    for epoch in range(cfg.num_epochs):
        train_loader.epoch = epoch
        for batch in train_loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
    print(f"# final train loss {float(m['loss']):.3f}", file=sys.stderr)

    # Bigram/trigram G trained from the TRAIN transcripts (the reference's
    # grammar was likewise estimated from corpus text).
    texts = [u.tokens for u in train_loader.utts]
    syms = [str(i) for i in range(6)]
    lm2 = train_ngram([[syms[t] for t in ts] for ts in texts], order=2)
    lm3 = train_ngram([[syms[t] for t in ts] for ts in texts], order=3)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(wav, lens):
        feats, flens = trainer.featurizer._featurize(wav, lens)
        return trainer.model.apply(variables, feats, flens, train=False)

    bs_cfg = BeamSearchConfig(beam_width=8, class_topk=5, max_len=64)
    lm_w = 0.5
    fused_cfg = BeamSearchConfig(beam_width=8, class_topk=5, max_len=64,
                                 lm_weight=lm_w)
    big = lm2.fusion_matrix(syms)
    eos2 = lm2.eos_vector(syms)
    tri = lm3.fusion_tensor3(syms)
    eos3 = lm3.eos_matrix(syms)
    pallas_beam = get_beam_search("pallas")

    hyp = {k: [] for k in ("g", "bx", "bp", "f2", "f3", "hb", "hg")}
    refs = []
    use_native = native.available()
    for batch in eval_loader:
        logp, out_lens = forward(jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_lens"]))
        g_t, g_l = greedy_decode(logp, out_lens)
        outs = {
            "bx": ctc_beam_search(logp, out_lens, bs_cfg),
            "bp": pallas_beam(logp, out_lens, bs_cfg),
            "f2": ctc_beam_search(logp, out_lens, fused_cfg,
                                  lm_bigram=big, lm_eos=eos2),
            "f3": ctc_beam_search(logp, out_lens, fused_cfg,
                                  lm_trigram=tri, lm_eos=eos3),
        }
        lp_np = np.asarray(logp, np.float32)
        ol_np = np.asarray(out_lens, np.int32)
        if use_native:
            hb = native.ctc_beam_search_host(lp_np, ol_np, beam_width=8,
                                             class_topk=5, max_len=64)
            hg_t, hg_l = native.ctc_greedy_host(lp_np, ol_np)
        for j in range(len(batch["real"])):
            if not batch["real"][j]:
                continue
            refs.append(batch["tokens"][j][:batch["token_lens"][j]].tolist())
            hyp["g"].append(np.asarray(g_t)[j][:int(g_l[j])].tolist())
            for k, o in outs.items():
                hyp[k].append(np.asarray(o["tokens"])[j, 0]
                              [:int(o["token_lens"][j, 0])].tolist())
            if use_native:
                hyp["hb"].append(hb["tokens"][j][:hb["token_lens"][j]]
                                 .tolist())
                hyp["hg"].append(hg_t[j][:hg_l[j]].tolist())

    ter = {k: wer(refs, v) for k, v in hyp.items() if v}
    out = {"metric": "ter_delta_beam_vs_greedy",
           "value": round(ter["bx"] - ter["g"], 4), "unit": "absolute",
           "ter_greedy": round(ter["g"], 4),
           "ter_beam_xla": round(ter["bx"], 4),
           "ter_beam_pallas": round(ter["bp"], 4),
           "ter_fused_bigram": round(ter["f2"], 4),
           "ter_fused_trigram": round(ter["f3"], 4),
           "lm_gain_bigram": round(ter["bx"] - ter["f2"], 4),
           "lm_gain_trigram": round(ter["bx"] - ter["f3"], 4),
           "pallas_vs_xla_agree": round(float(np.mean(
               [a == b for a, b in zip(hyp["bp"], hyp["bx"])])), 4),
           "n_eval_utts": len(refs),
           "backend": jax.default_backend()}
    if hyp["hb"]:
        out["device_vs_cpp_greedy_agree"] = round(float(np.mean(
            [g == h for g, h in zip(hyp["g"], hyp["hg"])])), 4)
        out["device_vs_cpp_beam_agree"] = round(float(np.mean(
            [b == h for b, h in zip(hyp["bx"], hyp["hb"])])), 4)
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
