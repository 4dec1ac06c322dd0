"""Shared CLI plumbing: argument groups, vocab loading, checkpoint lookup."""

from __future__ import annotations

import argparse
from pathlib import Path

from tpuasr.features import FeatureConfig
from tpuasr.models import MODEL_REGISTRY
from tpuasr.utils.compile_cache import enable_compilation_cache

# Every CLI entry point pays XLA compilation on cold start; the persistent
# cache makes repeat invocations (the common serving/ops pattern) reuse
# compiled executables across processes.
enable_compilation_cache()


def add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("model", choices=sorted(MODEL_REGISTRY),
                   help="acoustic model (reference model names)")
    p.add_argument("--units", type=str, default=None,
                   help="units/vocab file (one token name per line, id order; "
                        "line 0 = <blank>)")
    p.add_argument("--words", type=str, default=None,
                   help="words.txt symbol table (enables word output)")
    p.add_argument("--lexicon", type=str, default=None,
                   help="lexicon file 'WORD unit unit ...'; with --words, "
                        "decoded units are segmented into words (the "
                        "host-side half of the reference's latgen path)")
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--n-mels", type=int, default=64)
    p.add_argument("--feature-type", default="fbank",
                   choices=["fbank", "mfcc", "spectrogram"])
    p.add_argument("--no-cmvn", action="store_true",
                   help="disable per-utterance CMVN (required for the "
                        "streaming variant: CMVN is anti-causal)")
    p.add_argument("--use-cuda", action="store_true",
                   help="accepted for reference-CLI compatibility; ignored "
                        "(device selection is automatic: TPU if present)")
    return p


def add_lm_flags(p: argparse.ArgumentParser):
    g = p.add_argument_group("language model (the G of the reference's "
                             "TLG decode path)")
    g.add_argument("--lm", type=str, default=None,
                   help="ARPA n-gram LM over the unit symbols (see "
                        "'python lm.py train' to build one from a manifest)")
    g.add_argument("--lm-weight", type=float, default=1.0,
                   help="LM interpolation weight (shallow fusion or "
                        "rescoring)")
    g.add_argument("--lm-fusion", action="store_true",
                   help="apply the LM during the beam search (on-device "
                        "shallow fusion; full-order context is used "
                        "by the default n-best rescoring instead)")
    g.add_argument("--lm-fusion-order", type=int, default=2,
                   choices=[2, 3],
                   help="fusion context order: 2 = bigram (works in the "
                        "Pallas kernel), 3 = full trigram on device (XLA "
                        "search path; table grows as C^3 — phone-scale "
                        "inventories)")
    g.add_argument("--fst", type=str, default=None,
                   help="OpenFst WFST for host n-best rescoring/"
                        "transduction — binary (fstcompile/Kaldi mkgraph "
                        "vector or const fst) or text (fstprint output), "
                        "auto-detected; ilabels = unit ids (0 = <eps>)")
    g.add_argument("--fst-weight", type=float, default=1.0,
                   help="weight on the FST log-prob (minus tropical cost)")
    g.add_argument("--fst-isyms", type=str, default=None,
                   help="input symbol table for string-labeled FST text")
    g.add_argument("--fst-osyms", type=str, default=None,
                   help="output symbol table (words.txt) — transduced "
                        "outputs are printed through it")
    g.add_argument("--fst-decode", action="store_true",
                   help="FIRST-PASS decode over --fst (host C++ token "
                        "passing, tpuasr/decode/fst_decode.py — the "
                        "reference's latgen path over a user TLG.fst): the "
                        "graph drives the search instead of rescoring an "
                        "already-pruned n-best; emits word outputs")
    g.add_argument("--fst-beam", type=float, default=16.0,
                   help="first-pass pruning beam in tropical cost units "
                        "(Kaldi --beam)")
    g.add_argument("--fst-max-active", type=int, default=2000,
                   help="first-pass token cap per frame (Kaldi "
                        "--max-active)")
    g.add_argument("--acoustic-scale", type=float, default=1.0,
                   help="weight on the AM term vs graph costs in "
                        "--fst-decode (Kaldi --acoustic-scale)")
    g.add_argument("--fst-lattice-beam", type=float, default=8.0,
                   help="lattice pruning beam for --fst-decode n-best/"
                        "lattice outputs (Kaldi --lattice-beam; links "
                        "within this cost of the best path survive)")
    g.add_argument("--fst-nbest", type=int, default=1,
                   help="with --fst-decode: emit the top-N word sequences "
                        "from the lattice (exact A* n-best, "
                        "native/wfst_lattice.cc)")
    g.add_argument("--write-lattice", metavar="PATH", default=None,
                   help="with --fst-decode: write pruned raw lattices for "
                        "every utterance to PATH as a Kaldi-style text "
                        "archive (utt header, 'src dst word graph,acoustic,'"
                        " arcs, final-state lines)")
    gg = p.add_argument_group(
        "device graph decode (the TPU-native latgen: the decoding graph "
        "constrains the ON-DEVICE beam search itself — no host round trip; "
        "tpuasr/decode/graph.py)")
    gg.add_argument("--graph-decode", action="store_true",
                    help="graph-constrained decode ON DEVICE: compile the "
                         "graph to dense (S, C) tables and run the device "
                         "beam search under its constraint (words recovered "
                         "by min-cost replay through the original graph). "
                         "Graph source: --fst (a prebuilt L/LG/TLG over "
                         "unit ilabels), or built in-repo from --lexicon + "
                         "--words + --units, composed with a WORD-level "
                         "ARPA --lm when given (the mkgraph analog). "
                         "Replaces --beam/--fst-decode")
    gg.add_argument("--graph-weight", type=float, default=1.0,
                    help="weight on graph costs vs acoustics during the "
                         "search (like --acoustic-scale, inverted)")
    gg.add_argument("--graph-topk", type=int, default=8,
                    help="classes considered per step, selected PER BEAM "
                         "among graph-legal classes (graph-aware pruning); "
                         "exact vs a full-width search wherever graph "
                         "state out-degree <= this")
    gg.add_argument("--graph-prune", type=float, default=10.0,
                    help="pruned-determinization beam in cost units: subset "
                         "elements worse than this vs the subset best are "
                         "dropped, which GUARANTEES termination on non-twin "
                         "graphs (L*G with homophones — the case Kaldi "
                         "needs disambiguation symbols for). Exact for any "
                         "string whose best parse stays within this margin "
                         "at every prefix. <= 0 disables pruning (exact "
                         "determinization; may exhaust --graph-max-states "
                         "on homophone graphs)")
    gg.add_argument("--graph-quantum", type=float, default=0.1,
                    help="residual quantization grid for pruned "
                         "determinization: coarser = fewer states, at up to "
                         "quantum/2 cost drift per consumed symbol (drift "
                         "only STEERS the search; output words/scores come "
                         "from exact replay through the original graph)")
    gg.add_argument("--graph-max-states", type=int, default=400_000,
                    help="abort graph compilation past this many "
                         "determinized states")
    return p


def build_decode_graph(args, num_classes: int, units: list[str]):
    """Build the --graph-decode tables: (GraphTables, original WFST for
    word replay, word-name fn, olabel->word-id offset).

    Two sources (SURVEY.md section 3.2 latgen path):
      * ``--fst``: a prebuilt graph over unit ilabels (Kaldi mkgraph
        output or fstcompile text); word names via --fst-osyms.
      * in-repo mkgraph: L from --lexicon/--words/--units
        (olabels = words.txt id + 1), optionally composed with a
        WORD-level ARPA --lm into LG (tpuasr/decode/graph.py).
    """
    from tpuasr.decode import (compile_graph_tables, compose,
                               lexicon_to_fst, ngram_to_fst)
    if getattr(args, "fst", None):
        fst, osyms = load_fst(args)
        name_fn = osyms.sym if osyms is not None else str
        offset = 0
    else:
        if not (args.lexicon and args.words and units):
            raise SystemExit(
                "--graph-decode needs a graph: pass --fst, or build one "
                "in-repo with --lexicon + --words + --units "
                "(+ a word-level --lm for a grammar-bearing LG)")
        from tpuasr.decode.lexicon import Lexicon, SymbolTable
        words = SymbolTable.load(args.words)
        phones = SymbolTable.from_list(units)
        lex = Lexicon.load(args.lexicon, words, phones)
        # olabels = word id + 1: stable across multiple prons per word and
        # aligned with ngram_to_fst's sym2label space.
        fst = lexicon_to_fst([(wid, pron) for wid, pron in lex.prons],
                             olabels=[wid + 1 for wid, _ in lex.prons])
        lm = load_lm(args)
        if lm is not None:
            wsym2label = {words.sym(wid): wid + 1
                          for wid, _ in lex.prons}
            fst = compose(fst, ngram_to_fst(lm, wsym2label))
        name_fn = words.sym
        offset = -1
    prune = args.graph_prune if args.graph_prune > 0 else None
    try:
        tabs = compile_graph_tables(fst, num_classes,
                                    max_states=args.graph_max_states,
                                    prune=prune,
                                    quantum=args.graph_quantum)
    except ValueError as e:
        raise SystemExit(
            f"graph compilation failed: {e}\n"
            "Weighted determinization can blow up on non-twin graphs "
            "(L*G with homophones). Try --graph-prune 10 (on by default), "
            "a coarser --graph-quantum, a larger --graph-max-states, or "
            "decode this graph on the host first pass (--fst-decode)."
        ) from e
    return tabs, fst, name_fn, offset


def load_fst(args):
    """(WFST, output SymbolTable | None) from --fst flags, or (None, None)."""
    if not getattr(args, "fst", None):
        return None, None
    from tpuasr.decode import SymbolTable, WFST
    isyms = (SymbolTable.load(args.fst_isyms) if args.fst_isyms else None)
    osyms = (SymbolTable.load(args.fst_osyms) if args.fst_osyms else None)
    fst = WFST.load(args.fst, isyms=isyms, osyms=osyms)
    return fst, osyms if osyms is not None else fst.osyms


def fusion_tables(lm, syms: list[str], order: int) -> dict:
    """Beam-search kwargs for on-device shallow fusion at `order`."""
    if order == 3:
        return dict(lm_trigram=lm.fusion_tensor3(syms),
                    lm_eos=lm.eos_matrix(syms))
    return dict(lm_bigram=lm.fusion_matrix(syms),
                lm_eos=lm.eos_vector(syms))


def run_beam_search(impl: str, logp, lens, cfg, n_best: int, **kwargs):
    """Dispatch beam search at the requested impl. All fusion orders run in
    every impl; the only fallback is the Pallas kernel's explicit VMEM gate
    (trigram table too large for the vocabulary), and it is LOUD."""
    import sys

    from tpuasr.decode import get_beam_search
    try:
        return get_beam_search(impl)(logp, lens, cfg, n_best=n_best,
                                     **kwargs)
    except ValueError as e:
        if "XLA ctc_beam_search" not in str(e):
            raise
        print(f"# pallas beam kernel rejected the problem ({e}); "
              "falling back to the XLA implementation", file=sys.stderr)
        return get_beam_search("xla")(logp, lens, cfg, n_best=n_best,
                                      **kwargs)


def load_lm(args):
    """NGramLM from --lm, or None."""
    if not getattr(args, "lm", None):
        return None
    from tpuasr.lm import NGramLM
    return NGramLM.load_arpa(args.lm)


def lm_symbols(units: list[str], num_classes: int) -> list[str]:
    if units:
        return units
    return [str(i) for i in range(num_classes)]


def feature_config(args) -> FeatureConfig:
    no_cmvn = getattr(args, "no_cmvn", False)
    return FeatureConfig(sample_rate=args.sample_rate, n_mels=args.n_mels,
                         feature_type=args.feature_type,
                         cmn=not no_cmvn, cvn=not no_cmvn)


def load_units(path: str | None) -> list[str]:
    if path is None:
        return []
    return Path(path).read_text().splitlines()


def tokens_to_text(tokens, units: list[str]) -> str:
    if not units:
        return " ".join(str(int(t)) for t in tokens)
    return " ".join(units[int(t)] if 0 <= int(t) < len(units) else "<unk>"
                    for t in tokens)


def make_word_decoder(args):
    """Build (LexiconDecoder, words SymbolTable) from --lexicon/--words, or
    (None, None) when word output isn't requested."""
    if not args.lexicon or not args.words:
        return None, None
    from tpuasr.decode.lexicon import Lexicon, LexiconDecoder, SymbolTable
    words = SymbolTable.load(args.words)
    units = load_units(args.units)
    phones = SymbolTable.from_list(units) if units else None
    if phones is None:
        raise SystemExit("--lexicon requires --units (unit symbol table)")
    lex = Lexicon.load(args.lexicon, words, phones)
    return LexiconDecoder(lex, word_score=1.0), words
