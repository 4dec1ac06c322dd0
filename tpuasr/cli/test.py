"""``python test.py <model> --manifest ...`` — evaluate WER/TER on a labeled
set (reference: top-level test.py computing WER by edit distance, SURVEY.md
section 2.1 Predict/test row)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.cli.common import (add_common_flags, add_lm_flags,
                               feature_config, lm_symbols, load_lm,
                               load_units, make_word_decoder)
from tpuasr.data import AudioLoader, LoaderConfig
from tpuasr.decode import (BeamSearchConfig,
                           greedy_decode)
from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.models import create_model
from tpuasr.train.checkpoints import load_for_inference
from tpuasr.utils.metrics import wer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="test.py")
    add_common_flags(p)
    p.add_argument("--manifest", required=True)
    p.add_argument("--continue-from", "--checkpoint", dest="checkpoint",
                   required=True)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-label-len", type=int, default=64)
    p.add_argument("--beam", action="store_true")
    p.add_argument("--beam-width", type=int, default=16)
    p.add_argument("--class-topk", type=int, default=8)
    p.add_argument("--beam-impl", default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="beam search implementation (pallas = TPU kernel)")
    p.add_argument("--int8", action="store_true",
                   help="serve with int8 MXU input projections (quantized "
                        "serving path, DeepSpeech-family models; same "
                        "checkpoint — see tpuasr/ops/quant.py)")
    p.add_argument("--dump-loglikes", metavar="PREFIX", default=None,
                   help="also write per-utterance AM log-probs to "
                        "PREFIX.ark/.scp (Kaldi binary FM — the reference's "
                        "hybrid workflow fed these to external Kaldi "
                        "decoders)")
    p.add_argument("--align", metavar="PREFIX", default=None,
                   help="CTC-forced-align the reference transcripts and "
                        "write per-frame label ids to PREFIX.ark/.scp "
                        "(Kaldi binary FV; blank=0, -1 = infeasible — the "
                        "analog of Kaldi ali archives; the reference's "
                        "latgen returned alignments, SURVEY.md section 3.4)")
    p.add_argument("--write-segments", metavar="OUT.jsonl", default=None,
                   help="with --align: write a copy of the manifest whose "
                        "`segments` carry the forced-aligned per-token "
                        "sample spans — bootstraps frame-wise training "
                        "(LoaderConfig.frame_label_cfg; the CapsNet/SSVAE "
                        "path) from a CTC checkpoint, the role Kaldi "
                        "alignments played for the reference")
    add_lm_flags(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        variables, meta = load_for_inference(args.checkpoint)
    except FileNotFoundError as e:
        raise SystemExit(f"checkpoint not found: {e}") from e
    num_classes = meta.get("num_classes")
    units = load_units(args.units)
    if not num_classes:
        num_classes = len(units)
    if not num_classes:
        raise SystemExit("checkpoint lacks num_classes; pass --units")
    feat_cfg = (FeatureConfig(**meta["feature"]) if meta.get("feature")
                else feature_config(args))
    model_kwargs = dict(meta.get("model_kwargs", {}))
    if getattr(args, "int8", False):
        model_kwargs.update(pallas_gru=True, fused_proj=True,
                            int8_proj=True)
    model = create_model(meta.get("model", args.model),
                         num_classes=num_classes,
                         **model_kwargs)
    fz = Featurizer(feat_cfg)
    loader = AudioLoader(args.manifest,
                         LoaderConfig(batch_size=args.batch_size,
                                      max_label_len=args.max_label_len,
                                      shuffle=False))

    @jax.jit
    def forward(variables, tables, wav, wav_lens):
        # Weights/tables as args — closing over large device constants
        # degrades dispatch on the axon terminal (see cli/predict.py).
        feats, flens = fz._featurize(wav, wav_lens, tables=tables)
        return model.apply(variables, feats, flens, train=False)

    graph_search = None
    if args.graph_decode:
        # Device graph-constrained decode (the TPU-native latgen path);
        # see cli/predict.py. Words by replay through the original graph.
        if args.beam or args.fst_decode:
            raise SystemExit("--graph-decode replaces --beam/--fst-decode")
        from tpuasr.cli.common import build_decode_graph
        from tpuasr.decode import (GraphTables, ctc_beam_search,
                                   graph_tokens_to_words)
        tabs, gfst, gname_fn, goffset = build_decode_graph(
            args, num_classes, units)
        gtab_args = (jnp.asarray(tabs.next_state), jnp.asarray(tabs.cost),
                     jnp.asarray(tabs.final))

        @jax.jit
        def graph_search(lp, ol, nxt, cost, fin):
            gb_cfg = BeamSearchConfig(
                beam_width=args.beam_width, class_topk=args.graph_topk,
                max_len=int(lp.shape[1]), graph_weight=args.graph_weight)
            return ctc_beam_search(
                lp, ol, gb_cfg,
                graph=GraphTables(nxt, cost, fin, tabs.start))

    lm = load_lm(args)
    if lm is not None and not args.beam and not args.graph_decode:
        raise SystemExit("--lm requires --beam (the LM applies to beam "
                         "hypotheses) or --graph-decode (composed into LG)")
    from tpuasr.cli.common import load_fst
    fst, _fst_osyms = (None, None) if args.graph_decode \
        else load_fst(args)
    if args.fst_decode:
        if not args.fst:
            raise SystemExit("--fst-decode requires --fst")
        if args.beam or lm is not None:
            raise SystemExit("--fst-decode is a first-pass graph decode; "
                             "it replaces --beam/--lm")
    elif fst is not None and not args.beam:
        raise SystemExit("--fst requires --beam for rescoring "
                         "(or --fst-decode for a first-pass graph decode)")
    n_final = 0  # --fst-decode: utterances whose best token reached final
    syms = lm_symbols(units, num_classes)
    word_dec, words = make_word_decoder(args)
    utt_text = {u.id: u.text for u in loader.utts}
    refs, hyps = [], []
    wrefs, whyps = [], []
    if args.write_segments and not args.align:
        raise SystemExit("--write-segments requires --align")
    loglikes = []     # (utt_id, (T, C) log-probs) when --dump-loglikes
    aligns = []       # (utt_id, (T,) frame labels) when --align
    segments = {}     # utt_id -> [[tok, s0, s1], ...] when --write-segments
    if args.align:
        from tpuasr.losses import ctc_align
        align_fn = jax.jit(ctc_align)
    for batch in loader:
        logp, out_lens = forward(variables, getattr(fz, "tables", None),
                                 jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_lens"]))
        if args.align:
            al = align_fn(logp, jnp.asarray(batch["tokens"]), out_lens,
                          jnp.asarray(batch["token_lens"]))
            fl = np.asarray(al["frame_labels"]).astype(np.float32)
            ol = np.asarray(out_lens)
            for j in range(len(batch["real"])):
                if batch["real"][j]:
                    aligns.append((batch["ids"][j], fl[j, :ol[j]]))
            if args.write_segments:
                st = np.asarray(al["token_starts"])
                en = np.asarray(al["token_ends"])
                # model-output frame -> samples: out frames stride the
                # feature frames by (feat_len / out_len), feature frames
                # stride the waveform by hop_length.
                from tpuasr.features.reference import num_frames
                hop = feat_cfg.hop_length
                wav_lens = np.asarray(batch["wav_lens"])
                for j in range(len(batch["real"])):
                    if not batch["real"][j] or not bool(al["feasible"][j]):
                        continue
                    # Per-utterance feature length (NOT the padded bucket
                    # width: at >=25% pad slack the rounded stride flips
                    # 2->3 and every sample span inflates — advisor r2).
                    T_feat = num_frames(feat_cfg, int(wav_lens[j]))
                    stride = max(1, round(T_feat / max(int(ol[j]), 1)))
                    segs = []
                    for u in range(int(batch["token_lens"][j])):
                        s0 = int(st[j, u]) * stride * hop
                        s1 = (int(en[j, u]) * stride * hop
                              + feat_cfg.win_length)
                        segs.append([int(batch["tokens"][j][u]), s0, s1])
                    segments[batch["ids"][j]] = segs
        if args.dump_loglikes:
            lp_np = np.asarray(logp)
            ol_np = np.asarray(out_lens)
            for j in range(len(batch["real"])):
                if batch["real"][j]:
                    loglikes.append((batch["ids"][j],
                                     lp_np[j, :ol_np[j]]))
        if graph_search is not None:
            out = graph_search(logp, out_lens, *gtab_args)
            toks_g = np.asarray(out["tokens"])[:, 0]
            lens_g = np.asarray(out["token_lens"])[:, 0]
            reach_g = np.asarray(out["reached_final"])[:, 0]
            wordseqs = graph_tokens_to_words(gfst, toks_g, lens_g,
                                             offset=goffset)
            for j in range(len(batch["real"])):
                if not batch["real"][j]:
                    continue
                n_final += int(bool(reach_g[j]))
                wrefs.append(utt_text.get(batch["ids"][j], "").split())
                whyps.append([gname_fn(w) for w in wordseqs[j]])
            continue
        if args.fst_decode:
            # First-pass decode over the graph (the latgen path): word
            # hypotheses come straight off the WFST's output labels.
            from tpuasr.decode.fst_decode import wfst_ctc_decode
            fd = wfst_ctc_decode(fst, np.asarray(logp),
                                 np.asarray(out_lens), beam=args.fst_beam,
                                 max_active=args.fst_max_active,
                                 acoustic_scale=args.acoustic_scale)
            for j in range(len(batch["real"])):
                if not batch["real"][j]:
                    continue
                n = int(fd["word_lens"][j])
                n_final += int(bool(fd["reached_final"][j]))
                wrefs.append(utt_text.get(batch["ids"][j], "").split())
                whyps.append([_fst_osyms.sym(w) if _fst_osyms is not None
                              else str(w)
                              for w in fd["words"][j, :n]])
            continue
        if args.beam:
            rescore = lm is not None and not args.lm_fusion
            cfg = BeamSearchConfig(beam_width=args.beam_width,
                                   class_topk=args.class_topk,
                                   max_len=int(logp.shape[1]),
                                   lm_weight=args.lm_weight
                                   if args.lm_fusion else 0.0)
            beam_kwargs = {}
            impl = args.beam_impl
            if lm is not None and args.lm_fusion:
                from tpuasr.cli.common import fusion_tables
                beam_kwargs = fusion_tables(lm, syms, args.lm_fusion_order)
            from tpuasr.cli.common import run_beam_search
            out = run_beam_search(
                impl, logp, out_lens, cfg,
                n_best=cfg.beam_width if (rescore or fst) else 1,
                **beam_kwargs)
            toks_nb = np.asarray(out["tokens"])
            lens_nb = np.asarray(out["token_lens"])
            sc = np.asarray(out["scores"])
            if rescore:
                from tpuasr.lm import rescore_nbest
                sc = rescore_nbest(lm, toks_nb, lens_nb, sc, syms,
                                   lm_weight=args.lm_weight)
            if fst is not None:
                from tpuasr.decode import rescore_nbest_fst
                sc, _ = rescore_nbest_fst(fst, toks_nb, lens_nb, sc,
                                          fst_weight=args.fst_weight)
            if rescore or fst is not None:
                best = np.argmax(sc, axis=1)
                rows = np.arange(len(best))
                toks, tok_lens = toks_nb[rows, best], lens_nb[rows, best]
            else:
                toks, tok_lens = toks_nb[:, 0], lens_nb[:, 0]
        else:
            t, l = greedy_decode(logp, out_lens)
            toks, tok_lens = np.asarray(t), np.asarray(l)
        for j in range(len(batch["real"])):
            if not batch["real"][j]:
                continue
            refs.append(
                batch["tokens"][j][:batch["token_lens"][j]].tolist())
            hyp = toks[j][:tok_lens[j]].tolist()
            hyps.append(hyp)
            if word_dec is not None:
                wrefs.append(utt_text.get(batch["ids"][j], "").split())
                whyps.append([words.sym(w) for w in word_dec.decode(hyp)])
    if args.dump_loglikes:
        from tpuasr.utils.kaldi_io import write_ark_scp
        ark, scp = write_ark_scp(args.dump_loglikes, loglikes)
        print(f"# wrote {len(loglikes)} loglike matrices to {ark} ({scp})")
    if args.align:
        from tpuasr.utils.kaldi_io import write_ark_scp
        ark, scp = write_ark_scp(args.align, aligns)
        print(f"# wrote {len(aligns)} alignments to {ark} ({scp})")
    if args.write_segments:
        import dataclasses

        from tpuasr.data.manifest import write_manifest
        utts = [dataclasses.replace(u, segments=segments.get(u.id,
                                                             u.segments))
                for u in loader.utts]
        write_manifest(args.write_segments, utts)
        print(f"# wrote manifest with {len(segments)} aligned segment "
              f"lists to {args.write_segments}")
    if args.fst_decode or graph_search is not None:
        # Graph decode emits words, not unit tokens: word-level WER only.
        print(f"utterances: {len(wrefs)}  "
              f"word-error-rate: {wer(wrefs, whyps):.4f}  "
              f"final-reached: {n_final}/{len(wrefs)}")
        return 0
    ter = wer(refs, hyps)
    out = f"utterances: {len(refs)}  token-error-rate: {ter:.4f}"
    if word_dec is not None:
        out += f"  word-error-rate: {wer(wrefs, whyps):.4f}"
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
