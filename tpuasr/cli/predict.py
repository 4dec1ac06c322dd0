"""``python predict.py <model> wav [wav ...]`` — transcribe wav files
(reference: top-level predict.py -> asr.models.<model>.predict, SURVEY.md
section 3.2). Decoding is greedy or on-device prefix beam search (the
reference's --latgen path maps to --beam here; see tpuasr.decode)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.cli.common import (add_common_flags, add_lm_flags,
                               feature_config, lm_symbols, load_lm,
                               load_units, make_word_decoder, tokens_to_text)
from tpuasr.decode import (BeamSearchConfig,
                           greedy_decode)
from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.models import create_model
from tpuasr.train.checkpoints import load_for_inference


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="predict.py")
    add_common_flags(p)
    p.add_argument("wavs", nargs="+", help="wav files to transcribe")
    p.add_argument("--continue-from", "--checkpoint", dest="checkpoint",
                   required=True, help="checkpoint file or dir")
    p.add_argument("--beam", action="store_true",
                   help="CTC prefix beam search instead of greedy "
                        "(replaces the reference's Kaldi latgen path)")
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--class-topk", type=int, default=8)
    p.add_argument("--beam-impl", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="beam search implementation (pallas = TPU kernel)")
    p.add_argument("--nbest", type=int, default=1,
                   help="print the top-N beam hypotheses per wav")
    p.add_argument("--align", action="store_true",
                   help="also print per-token time spans from CTC forced "
                        "alignment of the best hypothesis (the reference "
                        "latgen path returned (words, alignments); "
                        "SURVEY.md section 3.4)")
    p.add_argument("--confidence", action="store_true",
                   help="also print confidence scores: per-utterance "
                        "(geometric-mean Viterbi path posterior; with "
                        "--beam also the hypothesis' posterior mass within "
                        "the beam) and per-token (mean class posterior over "
                        "the forced-alignment span) — "
                        "tpuasr/decode/confidence.py")
    p.add_argument("--int8", action="store_true",
                   help="serve with int8 MXU input projections (quantized "
                        "serving path, DeepSpeech-family models; same "
                        "checkpoint — see tpuasr/ops/quant.py)")
    p.add_argument("--dump-loglikes", metavar="PREFIX", default=None,
                   help="also write per-wav AM log-probs to PREFIX.ark/.scp "
                        "(Kaldi binary FM, keys = wav basenames — the "
                        "reference's hybrid workflow fed these to external "
                        "Kaldi decoders)")
    add_lm_flags(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    units = load_units(args.units)
    try:
        variables, meta = load_for_inference(args.checkpoint)
    except FileNotFoundError as e:
        raise SystemExit(f"checkpoint not found: {e}") from e
    if meta.get("model") and meta["model"] != args.model:
        print(f"# note: checkpoint was trained as {meta['model']!r}")
    num_classes = meta.get("num_classes") or (len(units) if units else None)
    if not num_classes:
        raise SystemExit("checkpoint lacks num_classes; pass --units")
    feat_cfg = (FeatureConfig(**meta["feature"]) if meta.get("feature")
                else feature_config(args))
    model_kwargs = dict(meta.get("model_kwargs", {}))
    if getattr(args, "int8", False):
        model_kwargs.update(pallas_gru=True, fused_proj=True,
                            int8_proj=True)
    model = create_model(meta.get("model", args.model),
                         num_classes=num_classes, **model_kwargs)
    fz = Featurizer(feat_cfg)

    from tpuasr.data.manifest import load_wav
    wavs, lens = [], []
    for path in args.wavs:
        data, sr = load_wav(path)
        if sr != feat_cfg.sample_rate:
            raise SystemExit(f"{path}: sample rate {sr} != "
                             f"{feat_cfg.sample_rate}")
        wavs.append(data)
        lens.append(len(data))
    S = max(lens)
    batch = np.zeros((len(wavs), S), np.float32)
    for i, w in enumerate(wavs):
        batch[i, :len(w)] = w

    @jax.jit
    def forward(variables, tables, wav, wav_lens):
        # Weights/tables ride as ARGUMENTS: a jit that closes over multi-MB
        # device constants permanently degrades dispatch on the axon TPU
        # terminal (~2 ms/call on every later executable).
        feats, flens = fz._featurize(wav, wav_lens, tables=tables)
        logp, out_lens = model.apply(variables, feats, flens, train=False)
        return logp, out_lens, flens

    logp, out_lens, feat_lens = forward(variables,
                                        getattr(fz, "tables", None),
                                        jnp.asarray(batch),
                                        jnp.asarray(lens, dtype=jnp.int32))
    if args.dump_loglikes:
        import os
        from tpuasr.utils.kaldi_io import write_ark_scp
        lp_np, ol_np = np.asarray(logp), np.asarray(out_lens)
        # Keys are wav basenames; uniquify collisions (a/x.wav + b/x.wav)
        # so Kaldi-side scp consumers don't silently shadow one entry.
        keys, counts = [], {}
        for p in args.wavs:
            k = os.path.splitext(os.path.basename(p))[0]
            n = counts.get(k, 0)
            counts[k] = n + 1
            keys.append(k if n == 0 else f"{k}-{n + 1}")
        items = [(k, lp_np[i, :ol_np[i]]) for i, k in enumerate(keys)]
        ark, scp = write_ark_scp(args.dump_loglikes, items)
        print(f"# wrote {len(items)} loglike matrices to {ark} ({scp})")
    if args.graph_decode:
        # Device graph-constrained decode (the TPU-native latgen,
        # SURVEY.md 3.2: in the reference, the graph-driven search WAS the
        # predict path): the compiled graph rides the on-device beam
        # search; posteriors never cross the PCIe boundary. The host C++
        # first pass remains available as --fst-decode.
        if args.beam or args.fst_decode:
            raise SystemExit("--graph-decode replaces --beam/--fst-decode")
        from tpuasr.cli.common import build_decode_graph
        from tpuasr.decode import (GraphTables, ctc_beam_search,
                                   graph_tokens_to_words)
        tabs, gfst, name_fn, offset = build_decode_graph(
            args, num_classes, units)
        n_best = max(1, args.nbest)
        gb_cfg = BeamSearchConfig(
            beam_width=max(args.beam_width, n_best),
            class_topk=args.graph_topk, max_len=int(logp.shape[1]),
            graph_weight=args.graph_weight)

        @jax.jit
        def graph_search(lp, ol, nxt, cost, fin):
            # Tables ride as jit ARGUMENTS (axon pathology: captured
            # multi-MB device constants degrade dispatch process-wide).
            return ctc_beam_search(
                lp, ol, gb_cfg, n_best=n_best,
                graph=GraphTables(nxt, cost, fin, tabs.start))

        out = graph_search(logp, out_lens, jnp.asarray(tabs.next_state),
                           jnp.asarray(tabs.cost), jnp.asarray(tabs.final))
        toks = np.asarray(out["tokens"])
        tok_lens = np.asarray(out["token_lens"])
        scores = np.asarray(out["scores"])
        reached = np.asarray(out["reached_final"])
        # Words by min-cost replay through the ORIGINAL graph — the device
        # analog of latgen's olabel output.
        wordseqs = graph_tokens_to_words(gfst, toks, tok_lens,
                                         offset=offset)
        for i, path in enumerate(args.wavs):
            for n in range(n_best):
                text = " ".join(name_fn(w)
                                for w in wordseqs[i * n_best + n])
                if n_best > 1:
                    print(f"{path}\t[{n}] {scores[i, n]:.2f}\t{text}")
                else:
                    print(f"{path}\t{text}")
            if not bool(reached[i, 0]):
                print("# graph: no final state reached "
                      "(partial hypothesis)")
        return 0

    if args.fst_decode:
        # First-pass decode over the graph (the reference's latgen path:
        # a user-supplied TLG.fst drives the search; SURVEY.md 3.4).
        if not args.fst:
            raise SystemExit("--fst-decode requires --fst")
        if args.beam or args.lm:
            raise SystemExit("--fst-decode is a first-pass graph decode; "
                             "it replaces --beam/--lm")
        from tpuasr.cli.common import load_fst
        fst, osyms = load_fst(args)
        lp_np, ol_np = np.asarray(logp), np.asarray(out_lens)
        # The lattice engine (native/wfst_lattice.cc) serves n-best,
        # confidence, and lattice export; plain 1-best stays on the
        # lighter Viterbi pass (native/wfst_decode.cc).
        want_lattice = (args.fst_nbest > 1 or args.confidence
                        or args.write_lattice)
        if want_lattice:
            from tpuasr.decode.fst_decode import wfst_ctc_decode_nbest
            out = wfst_ctc_decode_nbest(
                fst, lp_np, ol_np, beam=args.fst_beam,
                max_active=args.fst_max_active,
                lat_beam=args.fst_lattice_beam,
                nbest=max(args.fst_nbest, 1),
                acoustic_scale=args.acoustic_scale)
        else:
            from tpuasr.decode.fst_decode import wfst_ctc_decode
            out = wfst_ctc_decode(fst, lp_np, ol_np, beam=args.fst_beam,
                                  max_active=args.fst_max_active,
                                  acoustic_scale=args.acoustic_scale)
        if args.write_lattice:
            import os
            from tpuasr.decode.fst_decode import (wfst_ctc_lattice,
                                                  write_lattice_text)
            with open(args.write_lattice, "w") as fh:
                for i, path in enumerate(args.wavs):
                    key = os.path.splitext(os.path.basename(path))[0]
                    lat = wfst_ctc_lattice(
                        fst, lp_np[i, :int(ol_np[i])], beam=args.fst_beam,
                        max_active=args.fst_max_active,
                        lat_beam=args.fst_lattice_beam,
                        acoustic_scale=args.acoustic_scale)
                    write_lattice_text(fh, key, lat, words=osyms)
            print(f"# wrote {len(args.wavs)} lattices to "
                  f"{args.write_lattice}")

        def _name(w):
            return osyms.sym(w) if osyms is not None else str(w)

        fl_np = np.asarray(feat_lens)
        for i, path in enumerate(args.wavs):
            if want_lattice:
                for j in range(int(out["nhyp"][i])):
                    n = int(out["word_lens"][i, j])
                    text = " ".join(_name(w)
                                    for w in out["words"][i, j, :n])
                    if args.fst_nbest > 1:
                        print(f"{path}\t[{j}] {out['scores'][i, j]:.2f}"
                              f"\t{text}")
                    else:
                        print(f"{path}\t{text}")
                    if j == 0 and args.confidence and n:
                        conf = out["confidences"][i, :n]
                        parts = [f"{_name(w)}:{c:.3f}" for w, c in
                                 zip(out["words"][i, 0, :n], conf)]
                        print(f"# conf: {' '.join(parts)}")
                n = int(out["word_lens"][i, 0])
                ws = out["words"][i, 0, :n]
                fr = out["frames"][i, 0, :n]
            else:
                n = int(out["word_lens"][i])
                ws = out["words"][i, :n]
                fr = out["frames"][i, :n]
                text = " ".join(_name(w) for w in ws)
                print(f"{path}\t{text}")
            if not bool(out["reached_final"][i]):
                print("# fst: no final state reached (partial hypothesis)")
            if args.align and n:
                # Word emission times: model frames -> seconds via the
                # featurizer hop and the model's time stride.
                stride = max(1, round(float(fl_np[i]) /
                                      max(int(ol_np[i]), 1)))
                spf = stride * feat_cfg.hop_length / feat_cfg.sample_rate
                parts = [f"{_name(w)}[{max(f, 0) * spf:.2f}]"
                         for w, f in zip(ws, fr)]
                print(f"# align: {' '.join(parts)}")
        return 0

    lm = load_lm(args)
    if lm is not None and not args.beam:
        raise SystemExit("--lm requires --beam (the LM applies to beam "
                         "hypotheses)")
    if getattr(args, "fst", None) and not args.beam:
        raise SystemExit("--fst requires --beam for rescoring "
                         "(or --fst-decode for a first-pass graph decode)")
    n_best = max(1, args.nbest) if args.beam else 1
    fst_outs = fst_osyms = None
    if args.beam:
        cfg = BeamSearchConfig(beam_width=max(args.beam_width, n_best),
                               class_topk=args.class_topk,
                               max_len=int(logp.shape[1]),
                               lm_weight=args.lm_weight if args.lm_fusion
                               else 0.0)
        syms = lm_symbols(units, num_classes)
        beam_kwargs = {}
        impl = args.beam_impl
        if lm is not None and args.lm_fusion:
            # On-device shallow fusion (bigram AND trigram in both the XLA
            # scan and the Pallas kernel).
            from tpuasr.cli.common import fusion_tables
            beam_kwargs = fusion_tables(lm, syms, args.lm_fusion_order)
        rescore = lm is not None and not args.lm_fusion
        from tpuasr.cli.common import load_fst, run_beam_search
        fst, fst_osyms = load_fst(args)
        # Rescoring re-ranks the WHOLE beam, then keeps the top n_best.
        search_n = cfg.beam_width if (rescore or fst) else n_best
        out = run_beam_search(impl, logp, out_lens, cfg, n_best=search_n,
                              **beam_kwargs)
        toks = np.asarray(out["tokens"])
        tok_lens = np.asarray(out["token_lens"])
        scores = np.asarray(out["scores"])
        if rescore:
            # Full-order n-best rescoring (the lattice-rescoring analog).
            from tpuasr.lm import rescore_nbest
            scores = rescore_nbest(lm, toks, tok_lens, scores, syms,
                                   lm_weight=args.lm_weight)
        fst_outs = None
        if fst is not None:
            # WFST n-best rescoring/transduction (an OpenFst graph supplied
            # as data — the reference's TLG artifact path, SURVEY.md 3.4).
            from tpuasr.decode import rescore_nbest_fst
            scores, fst_outs = rescore_nbest_fst(
                fst, toks, tok_lens, scores, fst_weight=args.fst_weight)
        if rescore or fst is not None:
            order = np.argsort(-scores, axis=1)
            toks = np.take_along_axis(toks, order[:, :, None], axis=1)
            tok_lens = np.take_along_axis(tok_lens, order, axis=1)
            scores = np.take_along_axis(scores, order, axis=1)
            if fst_outs is not None:
                fst_outs = [[fst_outs[b][j] for j in order[b]]
                            for b in range(len(fst_outs))]
        beam_post = None
        if args.confidence:
            # Posterior mass of each hypothesis within the searched set
            # (normalized over the FULL beam, before n-best truncation).
            from tpuasr.decode import beam_posterior
            beam_post = np.asarray(
                beam_posterior(jnp.asarray(scores)))[:, :n_best]
        toks, tok_lens = toks[:, :n_best], tok_lens[:, :n_best]
        scores = scores[:, :n_best]
    else:
        t, l = greedy_decode(logp, out_lens)
        toks = np.asarray(t)[:, None]
        tok_lens = np.asarray(l)[:, None]
        scores = None
        beam_post = None

    spans = None
    conf_tok = conf_utt = None
    if args.align or args.confidence:
        # Forced-align the BEST hypothesis back onto the AM posteriors:
        # per-token model-frame spans -> seconds via the featurizer hop and
        # the model's time stride (feat frames / output frames); with
        # --confidence also per-token span posteriors + the utterance's
        # geometric-mean path posterior (decode/confidence.py).
        B = len(args.wavs)
        U = max(1, int(tok_lens[:, 0].max()))
        lab = np.zeros((B, U), np.int32)
        lab_lens = np.zeros((B,), np.int32)
        for i in range(B):
            n = int(tok_lens[i, 0])
            lab_lens[i] = n
            lab[i, :n] = toks[i, 0][:n]
        if args.confidence:
            from tpuasr.decode import align_confidence
            cf = jax.jit(align_confidence)(logp, jnp.asarray(lab),
                                           jnp.asarray(lab_lens), out_lens)
            conf_tok = np.asarray(cf["token_conf"])
            conf_utt = np.asarray(cf["utt_conf"])
            if args.align:
                spans = (np.asarray(cf["token_starts"]),
                         np.asarray(cf["token_ends"]))
        else:
            from tpuasr.losses import ctc_align
            al = jax.jit(ctc_align)(logp, jnp.asarray(lab), out_lens,
                                    jnp.asarray(lab_lens))
            spans = (np.asarray(al["token_starts"]),
                     np.asarray(al["token_ends"]))
        fl_np, ol_np = np.asarray(feat_lens), np.asarray(out_lens)

    word_dec, words = make_word_decoder(args)
    for i, path in enumerate(args.wavs):
        for n in range(n_best):
            seq = toks[i, n][:tok_lens[i, n]].tolist()
            if fst_outs is not None and fst_outs[i][n]:
                # FST transduction output (word ids through --fst-osyms).
                text = " ".join(
                    fst_osyms.sym(w) if fst_osyms is not None else str(w)
                    for w in fst_outs[i][n])
            elif word_dec is not None:
                text = " ".join(words.sym(w) for w in word_dec.decode(seq))
            else:
                text = tokens_to_text(seq, units)
            if n_best > 1:
                print(f"{path}\t[{n}] {scores[i, n]:.2f}\t{text}")
            else:
                print(f"{path}\t{text}")
        if spans is not None:
            stride = max(1, round(float(fl_np[i]) / max(int(ol_np[i]), 1)))
            spf = stride * feat_cfg.hop_length / feat_cfg.sample_rate
            st, en = spans
            parts = []
            for u in range(int(tok_lens[i, 0])):
                sym = (units[toks[i, 0, u]]
                       if units and toks[i, 0, u] < len(units)
                       else str(toks[i, 0, u]))
                parts.append(f"{sym}[{st[i, u] * spf:.2f}"
                             f"-{en[i, u] * spf:.2f}]")
            print(f"# align: {' '.join(parts)}")
        if conf_utt is not None:
            head = f"# conf: utt {conf_utt[i]:.3f}"
            if beam_post is not None:
                head += f" beam {beam_post[i, 0]:.3f}"
            parts = []
            for u in range(int(tok_lens[i, 0])):
                sym = (units[toks[i, 0, u]]
                       if units and toks[i, 0, u] < len(units)
                       else str(toks[i, 0, u]))
                parts.append(f"{sym} {conf_tok[i, u]:.3f}")
            print(head + (" | " + " ".join(parts) if parts else ""))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
