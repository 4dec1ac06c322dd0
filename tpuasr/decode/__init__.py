"""Decoders: greedy CTC collapse and batched on-device prefix beam search.

Replaces the reference's two decode paths (SURVEY.md sections 2.1/3.2):
  * greedy argmax -> collapse repeats -> strip blanks (reference: decode util
    in model predict.py) — here a fixed-shape, jit-safe device function;
  * the Kaldi latgen C++ binding (LatticeFasterDecoder over a TLG.fst) — here
    re-cast as a batched, XLA-compilable CTC prefix beam search
    (decode/prefix_beam.py) so inference runs end-to-end on device; the
    lexicon/word mapping is applied host-side (decode/lexicon.py).
"""

from tpuasr.decode.confidence import align_confidence, beam_posterior
from tpuasr.decode.fst import (WFST, lexicon_to_fst,
                               rescore_nbest_fst)
from tpuasr.decode.fst_decode import (wfst_ctc_decode,
                                      wfst_ctc_decode_nbest,
                                      wfst_ctc_lattice,
                                      write_lattice_text)
from tpuasr.decode.graph import (GraphTables, compile_graph_tables, compose,
                                 determinize, graph_tokens_to_words,
                                 ngram_to_fst)
from tpuasr.decode.greedy import greedy_decode
from tpuasr.decode.lexicon import Lexicon, LexiconDecoder, SymbolTable
from tpuasr.decode.prefix_beam import (BeamSearchConfig, apply_score_bias,
                                       beam_init_state, beam_results,
                                       ctc_beam_search)


def get_beam_search(impl: str = "auto"):
    """impl: 'xla' (scan, hash-join merge) | 'pallas' (VMEM kernel, all
    classes, ~2x faster on TPU) | 'auto' (pallas on TPU, xla elsewhere)."""
    if impl == "auto":
        import jax
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return ctc_beam_search
    if impl == "pallas":
        from tpuasr.decode.pallas_beam import ctc_beam_search_pallas
        return ctc_beam_search_pallas
    raise ValueError(f"unknown beam impl {impl!r}")


__all__ = ["greedy_decode", "ctc_beam_search", "BeamSearchConfig",
           "get_beam_search", "apply_score_bias", "beam_init_state",
           "beam_results", "Lexicon", "LexiconDecoder", "SymbolTable",
           "WFST", "rescore_nbest_fst", "lexicon_to_fst",
           "wfst_ctc_decode", "wfst_ctc_decode_nbest", "wfst_ctc_lattice",
           "write_lattice_text", "align_confidence", "beam_posterior",
           "GraphTables", "compile_graph_tables", "compose", "determinize",
           "graph_tokens_to_words", "ngram_to_fst"]
