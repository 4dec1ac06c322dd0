"""First-pass CTC decoding over an arbitrary WFST (host).

The reference decoded by walking a Kaldi-built ``TLG.fst`` with the C++
latgen binding (SURVEY.md section 2.1 latgen row / 3.4). tpuasr's primary
path decodes ON DEVICE (prefix beam search + host lexicon/LM), but a user
arriving with their own decoding graph wants the graph to *drive* the
search — rescoring an already-pruned n-best cannot recover hypotheses the
graph would have kept. This module is that first pass:

* ``wfst_ctc_decode`` — batched host decode of AM log-posteriors against a
  :class:`tpuasr.decode.fst.WFST` (text or binary OpenFst, e.g. a real
  ``TLG.fst``). Backed by ``native/wfst_decode.cc`` (C++, ctypes) with a
  pure-Python fallback that doubles as the test oracle.

The CTC topology is implicit (EESEN-style token passing): graph ilabels
are CTC class ids (0 = epsilon, never blank), blanks and repeat-collapse
are handled by the decoder itself, so plain L / LG / TLG graphs work
without a T transducer. Weights are tropical costs; ``acoustic_scale``
multiplies the AM term (Kaldi's convention).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from tpuasr.decode.fst import INF, WFST
from tpuasr.native.ctc_host import _NATIVE_DIR, build

_LIB_PATH = _NATIVE_DIR / "libwfst_decode.so"
_lib = None

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.wfst_ctc_decode.argtypes = [
        _f32p, _i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _i32p, _i32p, _i32p, _i32p, _f32p, _f32p,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_float,
        ctypes.c_int, _i32p, _i32p, _i32p, _f32p, _i32p]
    lib.wfst_ctc_decode.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


@dataclass
class FlatFST:
    """CSR view of a WFST as consumed by the native decoder."""
    start: int
    arc_off: np.ndarray     # (S+1) int32
    ilabels: np.ndarray     # (A,) int32
    olabels: np.ndarray     # (A,) int32
    dsts: np.ndarray        # (A,) int32
    weights: np.ndarray     # (A,) float32
    finals: np.ndarray      # (S,) float32, 1e30 for non-final

    @property
    def num_states(self) -> int:
        return len(self.finals)


_BIG = np.float32(1e30)


def flatten_fst(fst: WFST) -> FlatFST:
    """Flatten to CSR arrays (cached on the WFST instance)."""
    cached = getattr(fst, "_flat_cache", None)
    if cached is not None:
        return cached
    # CSR is indexed by raw state id: size by max id + 1, not by the count
    # of distinct states (ids need not be contiguous in hand-built graphs).
    S = max([fst.start] + list(fst.finals)
            + [s for s in fst.arcs]
            + [a.dst for arcs in fst.arcs.values() for a in arcs]) + 1
    off = np.zeros(S + 1, np.int32)
    for s, arcs in fst.arcs.items():
        off[s + 1] = len(arcs)
    off = np.cumsum(off, dtype=np.int32)
    A = int(off[-1])
    il = np.zeros(A, np.int32)
    ol = np.zeros(A, np.int32)
    ds = np.zeros(A, np.int32)
    wt = np.zeros(A, np.float32)
    for s, arcs in fst.arcs.items():
        p = int(off[s])
        for i, a in enumerate(arcs):
            il[p + i], ol[p + i] = a.ilabel, a.olabel
            ds[p + i], wt[p + i] = a.dst, a.weight
    fin = np.full(S, _BIG, np.float32)
    for s, w in fst.finals.items():
        fin[s] = min(w, float(_BIG))
    flat = FlatFST(fst.start, off, il, ol, ds, wt, fin)
    fst._flat_cache = flat
    return flat


def wfst_ctc_decode(fst: WFST, log_probs, lengths, *, beam: float = 16.0,
                    max_active: int = 2000, blank: int = 0,
                    acoustic_scale: float = 1.0, max_words: int = 512,
                    impl: str = "auto"):
    """Batched first-pass Viterbi decode of CTC posteriors over ``fst``.

    Args:
      log_probs: (B, T, C) float32 log-softmax AM outputs.
      lengths: (B,) valid frame counts.
      beam: tropical pruning beam (cost units, like Kaldi's --beam).
      max_active: token cap per frame (Kaldi's --max-active).
      acoustic_scale: weight on the AM term vs graph costs.
      impl: "native" | "py" | "auto" (native when the .so builds).
    Returns dict:
      words: (B, max_words) int32 output labels (pad -1).
      word_lens: (B,) int32.
      frames: (B, max_words) int32 frame each word was emitted on (-1 for
        words emitted by the initial epsilon closure).
      scores: (B,) float32 = -(best path cost incl. final weight).
      reached_final: (B,) bool — False means the best live token did not
        sit on a final state and the hypothesis is partial (latgen-faster
        semantics).
    """
    log_probs = np.ascontiguousarray(log_probs, np.float32)
    lengths = np.ascontiguousarray(lengths, np.int32)
    B, T, C = log_probs.shape
    flat = flatten_fst(fst)
    if impl == "auto":
        impl = "native" if available() else "py"
    if impl == "native":
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable (build failed?)")
        words = np.full((B, max_words), -1, np.int32)
        frames = np.full((B, max_words), -1, np.int32)
        lens = np.zeros(B, np.int32)
        scores = np.zeros(B, np.float32)
        final = np.zeros(B, np.int32)
        lib.wfst_ctc_decode(
            log_probs, lengths, B, T, C, flat.num_states, len(flat.ilabels),
            flat.start, flat.arc_off, flat.ilabels, flat.olabels, flat.dsts,
            flat.weights, flat.finals, blank, beam, max_active,
            acoustic_scale, max_words, words, frames, lens, scores, final)
        return dict(words=words, word_lens=lens, frames=frames,
                    scores=scores, reached_final=final.astype(bool))
    if impl != "py":
        raise ValueError(f"unknown impl {impl!r}")
    outs = [_decode_single_py(flat, log_probs[b, :int(lengths[b])], blank,
                              beam, max_active, acoustic_scale)
            for b in range(B)]
    words = np.full((B, max_words), -1, np.int32)
    frames = np.full((B, max_words), -1, np.int32)
    lens = np.zeros(B, np.int32)
    scores = np.zeros(B, np.float32)
    final = np.zeros(B, bool)
    for b, (w, f, sc, fin) in enumerate(outs):
        n = min(len(w), max_words)
        lens[b] = n
        words[b, :n] = w[:n]
        frames[b, :n] = f[:n]
        scores[b] = sc
        final[b] = fin
    return dict(words=words, word_lens=lens, frames=frames, scores=scores,
                reached_final=final)


def _decode_single_py(flat: FlatFST, lp: np.ndarray, blank: int, beam: float,
                      max_active: int, asc: float):
    """Pure-Python mirror of native/wfst_decode.cc (oracle + fallback).

    Tokens are dicts (state, last_symbol) -> (cost, trace); the trace is a
    tuple-chain ((words...), (frames...)) — fine at oracle scale.
    """
    import heapq

    off, il, ol, ds, wt = (flat.arc_off, flat.ilabels, flat.olabels,
                           flat.dsts, flat.weights)
    C = lp.shape[1] if lp.ndim == 2 else 0

    def closure(toks, frame):
        pq = [(c, k) for k, (c, _) in toks.items()]
        heapq.heapify(pq)
        while pq:
            c, k = heapq.heappop(pq)
            cur = toks.get(k)
            if cur is None or cur[0] < c:
                continue
            s, u = k
            tr = cur[1]
            for a in range(int(off[s]), int(off[s + 1])):
                if il[a] != 0:
                    continue
                nc = c + float(wt[a])
                nk = (int(ds[a]), u)
                if nk in toks and toks[nk][0] <= nc:
                    continue
                ntr = tr if ol[a] == 0 else (tr + ((int(ol[a]), frame),))
                toks[nk] = (nc, ntr)
                heapq.heappush(pq, (nc, nk))

    def pruned(toks):
        if not toks:
            return toks
        best = min(c for c, _ in toks.values())
        cut = best + beam
        kept = {k: v for k, v in toks.items() if v[0] <= cut}
        if max_active > 0 and len(kept) > max_active:
            costs = sorted(c for c, _ in kept.values())
            cut = min(cut, costs[max_active - 1])
            kept = {k: v for k, v in kept.items() if v[0] <= cut}
        return kept

    toks = {(flat.start, blank): (0.0, ())}
    closure(toks, -1)
    T = lp.shape[0]
    for t in range(T):
        p = lp[t]
        nxt: dict = {}

        def relax(k, c, tr, nxt=nxt):
            if k not in nxt or c < nxt[k][0]:
                nxt[k] = (c, tr)

        for (s, u), (c, tr) in toks.items():
            relax((s, blank), c - asc * float(p[blank]), tr)
            if u != blank:
                relax((s, u), c - asc * float(p[u]), tr)
            for a in range(int(off[s]), int(off[s + 1])):
                k = int(il[a])
                if k == 0 or k == u or k >= C:
                    continue
                nc = c + float(wt[a]) - asc * float(p[k])
                ntr = tr if ol[a] == 0 else (tr + ((int(ol[a]), t),))
                relax((int(ds[a]), k), nc, ntr)
        toks = nxt
        closure(toks, t)
        toks = pruned(toks)

    best_f = best_any = float(INF)
    tr_f = tr_any = ()
    for (s, _), (c, tr) in toks.items():
        if c < best_any:
            best_any, tr_any = c, tr
        fw = float(flat.finals[s])
        if fw < float(_BIG) and c + fw < best_f:
            best_f, tr_f = c + fw, tr
    fin = best_f < float(_BIG)
    tr = tr_f if fin else tr_any
    score = -(best_f if fin else best_any) if (fin or best_any < INF) \
        else -float(_BIG)
    words = [w for w, _ in tr]
    frames = [f for _, f in tr]
    return words, frames, float(score), fin
