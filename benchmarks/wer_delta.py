#!/usr/bin/env python
"""WER-delta harness (BASELINE north star: <=0.2% absolute WER delta vs the
reference decode). With no readable reference tree (SURVEY.md provenance),
the deltas measurable today are decode-path deltas on a trained model:

  * greedy (device)        vs greedy (C++ host)      — must be 0
  * beam (device, hash-join merge) vs beam (C++ host, exact map merge)
  * beam vs greedy TER on a held-out synthetic set   — beam should be <= greedy

Trains a small DeepSpeech on the synthetic tone corpus until it actually
transcribes, then reports all three. Re-point at real ASpIRE data + the
PyTorch reference when available.
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tpuasr import native
    from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
    from tpuasr.decode import (BeamSearchConfig, ctc_beam_search,
                               greedy_decode)
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.metrics import wer

    tmp = Path(tempfile.mkdtemp(prefix="werdelta_"))
    train_c = make_synthetic_corpus(tmp / "train", num_utts=48, vocab_size=6,
                                    min_tokens=2, max_tokens=5, seed=11)
    eval_c = make_synthetic_corpus(tmp / "eval", num_utts=24, vocab_size=6,
                                   min_tokens=2, max_tokens=5, seed=23,
                                   split="eval")
    lcfg = LoaderConfig(batch_size=8, max_label_len=8)
    train_loader = AudioLoader(train_c.manifest, lcfg)
    eval_loader = AudioLoader(eval_c.manifest,
                              LoaderConfig(batch_size=8, max_label_len=8,
                                           shuffle=False))
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=6,
                      model_kwargs=dict(rnn_hidden=64, rnn_layers=2,
                                        conv_channels=8, dropout=0.0),
                      lr=3e-3, num_epochs=12, warmup_steps=20,
                      log_every=10 ** 9)
    trainer = Trainer(cfg, FeatureConfig(n_mels=40))
    state = trainer.init_state(
        train_loader.make_batch(train_loader.batch_plan(0)[0]))
    for epoch in range(cfg.num_epochs):
        train_loader.epoch = epoch
        for batch in train_loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
    print(f"# final train loss {float(m['loss']):.3f}", file=sys.stderr)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(wav, lens):
        feats, flens = trainer.featurizer._featurize(wav, lens)
        return trainer.model.apply(variables, feats, flens, train=False)

    refs, g_hyps, b_hyps, hb_hyps, hg_hyps = [], [], [], [], []
    bs_cfg = BeamSearchConfig(beam_width=8, class_topk=5, max_len=64)
    for batch in eval_loader:
        logp, out_lens = forward(jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_lens"]))
        g_t, g_l = greedy_decode(logp, out_lens)
        b = ctc_beam_search(logp, out_lens, bs_cfg)
        lp_np = np.asarray(logp, np.float32)
        ol_np = np.asarray(out_lens, np.int32)
        use_native = native.available()
        if use_native:
            hb = native.ctc_beam_search_host(lp_np, ol_np, beam_width=8,
                                             class_topk=5, max_len=64)
            hg_t, hg_l = native.ctc_greedy_host(lp_np, ol_np)
        for j in range(len(batch["real"])):
            if not batch["real"][j]:
                continue
            refs.append(batch["tokens"][j][:batch["token_lens"][j]].tolist())
            g_hyps.append(np.asarray(g_t)[j][:int(g_l[j])].tolist())
            b_hyps.append(np.asarray(b["tokens"])[j, 0]
                          [:int(b["token_lens"][j, 0])].tolist())
            if use_native:
                hb_hyps.append(hb["tokens"][j][:hb["token_lens"][j]]
                               .tolist())
                hg_hyps.append(hg_t[j][:hg_l[j]].tolist())

    ter_g = wer(refs, g_hyps)
    ter_b = wer(refs, b_hyps)
    out = {"metric": "ter_delta_beam_vs_greedy",
           "value": round(ter_b - ter_g, 4), "unit": "absolute",
           "ter_greedy": round(ter_g, 4), "ter_beam": round(ter_b, 4)}
    if hb_hyps:
        agree_g = np.mean([g == h for g, h in zip(g_hyps, hg_hyps)])
        agree_b = np.mean([b == h for b, h in zip(b_hyps, hb_hyps)])
        out["device_vs_cpp_greedy_agree"] = round(float(agree_g), 4)
        out["device_vs_cpp_beam_agree"] = round(float(agree_b), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
