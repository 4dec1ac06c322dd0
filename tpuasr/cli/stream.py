"""``python stream.py <wav> --checkpoint ...`` — simulate online streaming
recognition over a wav file (chunked feed; prints tokens as they are
emitted). Requires a checkpoint of the streaming model variant
(deepspeech_ctc with bidirectional=False, explicit_pad=True)."""

from __future__ import annotations

import argparse
import dataclasses

from tpuasr.cli.common import add_lm_flags, load_lm, load_units, \
    tokens_to_text
from tpuasr.features import FeatureConfig
from tpuasr.serve import StreamingRecognizer
from tpuasr.train.checkpoints import load_for_inference


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="stream.py")
    p.add_argument("wav")
    p.add_argument("--continue-from", "--checkpoint", dest="checkpoint",
                   required=True)
    p.add_argument("--units", default=None)
    p.add_argument("--words", default=None,
                   help="words.txt symbol table (for --graph-decode word "
                        "output)")
    p.add_argument("--lexicon", default=None,
                   help="lexicon 'WORD unit unit ...' — with --words and "
                        "--graph-decode, the decoding graph is built "
                        "in-repo (tpuasr/decode/graph.py)")
    p.add_argument("--chunk-ms", type=float, default=200.0)
    p.add_argument("--beam", action="store_true",
                   help="resumable prefix beam search across chunks "
                        "(prints the running best hypothesis per chunk; "
                        "earlier output may be revised)")
    p.add_argument("--beam-width", type=int, default=8)
    p.add_argument("--timestamps", action="store_true",
                   help="per-token times: greedy mode tags each token with "
                        "its emission time as it streams; beam mode "
                        "CTC-forced-aligns the final hypothesis "
                        "(tpuasr.losses.ctc_align) and prints spans")
    add_lm_flags(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        variables, meta = load_for_inference(args.checkpoint)
    except FileNotFoundError as e:
        raise SystemExit(f"checkpoint not found: {e}") from e
    if meta.get("model_kwargs", {}).get("bidirectional", True):
        raise SystemExit(
            "streaming needs a unidirectional checkpoint: train with "
            "--model-kwargs bidirectional=False explicit_pad=True "
            "(TrainConfig.model_kwargs)")
    feat_cfg = FeatureConfig(**meta["feature"])
    if feat_cfg.cmn or feat_cfg.cvn:
        feat_cfg = dataclasses.replace(feat_cfg, cmn=False, cvn=False)
        print("# note: disabling CMVN for streaming (anti-causal)")
    units = load_units(args.units)

    from tpuasr.data.manifest import load_wav
    wav, sr = load_wav(args.wav)
    if sr != feat_cfg.sample_rate:
        raise SystemExit(f"sample rate {sr} != {feat_cfg.sample_rate}")
    chunk = max(1, int(sr * args.chunk_ms / 1000.0))

    gfst = gname_fn = None
    if args.graph_decode:
        # Streaming graph-constrained decode: the graph rides the
        # resumable beam search, its per-beam state part of the
        # chunk-to-chunk carry (tpuasr/serve/streaming.py graph=).
        from tpuasr.cli.common import build_decode_graph
        from tpuasr.decode import BeamSearchConfig
        num_classes = meta.get("num_classes") or len(units)
        tabs, gfst, gname_fn, goffset = build_decode_graph(
            args, num_classes, units)
        cfg = BeamSearchConfig(beam_width=args.beam_width,
                               class_topk=args.graph_topk,
                               graph_weight=args.graph_weight)
        rec = StreamingRecognizer(variables, feat_cfg, decode="beam",
                                  beam_cfg=cfg, graph=tabs,
                                  keep_logp=args.timestamps)
        beam_mode = True
    else:
        lm = load_lm(args)
        if args.beam or lm is not None:
            from tpuasr.cli.common import lm_symbols
            from tpuasr.decode import BeamSearchConfig
            num_classes = meta.get("num_classes") or len(units)
            cfg = BeamSearchConfig(beam_width=args.beam_width,
                                   lm_weight=args.lm_weight if lm else 0.0)
            kw = {}
            if lm is not None:
                syms = lm_symbols(units, num_classes)
                kw = dict(lm_bigram=lm.fusion_matrix(syms),
                          lm_eos=lm.eos_vector(syms))
            rec = StreamingRecognizer(variables, feat_cfg, decode="beam",
                                      beam_cfg=cfg,
                                      keep_logp=args.timestamps, **kw)
            beam_mode = True
        else:
            rec = StreamingRecognizer(variables, feat_cfg)
            beam_mode = False

    def fmt(toks, frames):
        if not args.timestamps or beam_mode:
            return tokens_to_text(toks, units)
        spf = rec.frame_seconds
        return " ".join(f"{tokens_to_text([t], units)}@{f * spf:.2f}"
                        for t, f in zip(toks, frames))

    t_ms = 0.0
    n_emitted = 0
    for s in range(0, len(wav), chunk):
        toks = rec.feed(wav[s:s + chunk])
        t_ms += args.chunk_ms
        if toks:
            tag = "hyp" if beam_mode else "new"
            frames = rec.token_frames[n_emitted:]
            n_emitted = len(rec.token_frames)
            print(f"[{t_ms / 1000.0:7.2f}s {tag}] "
                  f"{fmt(toks, frames)}", flush=True)
    toks = rec.flush()
    if toks:
        frames = rec.token_frames[n_emitted:]
        print(f"[  final] {fmt(toks, frames)}")
    print(f"# transcript: {tokens_to_text(rec.tokens, units)}")
    if gfst is not None:
        # Word recovery by min-cost replay of the final hypothesis through
        # the original graph (the latgen olabel analog).
        import math as _math
        cost, ols = gfst.score([int(t) for t in rec.tokens])
        if _math.isinf(cost):
            print("# words: (hypothesis has no complete parse in the "
                  "graph)")
        else:
            print("# words: "
                  + " ".join(gname_fn(int(o) + goffset) for o in ols))
    if args.timestamps and beam_mode and rec.tokens:
        # Forced-align the final hypothesis over the full AM output.
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tpuasr.losses import ctc_align
        logp = np.concatenate(rec.logp_history, axis=0)     # (T, C)
        lab = np.asarray(rec.tokens, np.int32)
        al = jax.jit(ctc_align)(jnp.asarray(logp)[None], jnp.asarray(lab)[None],
                                jnp.asarray([logp.shape[0]], jnp.int32),
                                jnp.asarray([len(lab)], jnp.int32))
        st = np.asarray(al["token_starts"])[0]
        en = np.asarray(al["token_ends"])[0]
        spf = rec.frame_seconds
        parts = [f"{tokens_to_text([t], units)}"
                 f"[{st[u] * spf:.2f}-{en[u] * spf:.2f}]"
                 for u, t in enumerate(rec.tokens)]
        print(f"# align: {' '.join(parts)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
