#!/usr/bin/env python
"""WER-delta harness (BASELINE north star: <=0.2% absolute WER delta vs the
reference decode). With no readable reference tree (SURVEY.md provenance),
the deltas measurable today are decode-path deltas on a trained model:

  * greedy (device)         vs greedy (C++ host)     — must agree exactly
  * beam XLA (device)       vs beam (C++ host, exact map merge)
  * beam Pallas (TPU default) vs beam XLA            — kernel parity at
    eval scale, not just unit shapes
  * beam vs greedy WER on a held-out set             — beam should WIN
  * LM-fused beam (bigram + trigram, on device)      — the TLG-grammar
    analog must HELP on an n-gram-structured corpus
  * graph-constrained device beam (TL and LG graphs) vs the host C++
    WFST first pass on the SAME graphs — the round-4 flagship: the graph
    constraint rides the TPU search itself, and every WER arm carries a
    measured RTF column (VERDICT r3 next #1/#2/#4)

Round-4 redesign of the eval language (VERDICT r3 next #5): the corpus now
contains HOMOPHONES (identical pronunciations, distinct words) under a
Markov-skewed word distribution, so the lexicon alone cannot reach the WER
floor — grammar context must resolve them, which makes the value of G
measurable instead of noise-level. Fusion/graph weights are tuned on a
held-out DEV split, never on eval.

Round-3 redesign (VERDICT r2 item 2 — the round-2 harness could not resolve
the 0.2% north star): >=300 eval utterances, a word LEXICON (scoring is
word-level WER through ``LexiconDecoder``, not token error rate), confusable
phone pairs + duration/frequency jitter + an SNR sweep so the acoustics are
ambiguous enough that beam search measurably beats greedy BEFORE any LM, and
every WER carries a binomial 95% confidence interval. ``--inject-bug``
deliberately breaks the beam merge (logsumexp -> max, a classic subtle
scoring bug) so tests can verify the harness actually detects such bugs.

Reports ONE JSON line; --out writes the same record to a file (the per-round
WERDELTA artifact). Re-point at real ASpIRE data + the PyTorch reference when
/root/reference materializes (benchmarks/rebaseline.py).
"""

import argparse
import json
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _ci95(err_rate: float, n: int) -> float:
    """Binomial normal-approx 95% half-width on an error rate."""
    p = min(max(err_rate, 0.0), 1.0)
    return 1.96 * math.sqrt(p * (1.0 - p) / max(n, 1))


def _paired_delta_ci95(refs, hyp_a, hyp_b, n_boot=2000, seed=0):
    """Bootstrap 95% half-width on WER(a) - WER(b) over the SAME utterances.

    The binomial CI on an absolute WER cannot resolve a 0.2% decoder delta
    at a few thousand words, but the paired delta can: decoders agree on
    most utterances, so per-utterance error-count differences are sparse
    and the delta's sampling variance is far below the absolute rate's.
    """
    from tpuasr.utils.metrics import edit_distance
    d = np.array([edit_distance(r, a) - edit_distance(r, b)
                  for r, a, b in zip(refs, hyp_a, hyp_b)], np.float64)
    n_words = np.array([max(len(r), 1) for r in refs], np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, len(d), size=(n_boot, len(d)))
    deltas = d[idx].sum(1) / n_words[idx].sum(1)
    lo, hi = np.percentile(deltas, [2.5, 97.5])
    return float((hi - lo) / 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-eval", type=int, default=320)
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for unit tests (NOT the artifact)")
    ap.add_argument("--inject-bug", action="store_true",
                    help="break the XLA beam merge (logsumexp->max) to "
                         "verify the harness detects scoring bugs")
    ap.add_argument("--int8", action="store_true",
                    help="also score the int8_proj quantized serving path "
                         "(same checkpoint; reports the int8 WER delta)")
    ap.add_argument("--int8-rec", action="store_true",
                    help="with --int8: ALSO score the int8-recurrence "
                         "variant (int8_rec)")
    ap.add_argument("--soft-epochs", type=int, default=6,
                    help="snapshot the AM at this epoch for the SOFT "
                         "operating point (posteriors still ambiguous, "
                         "where beam search must beat greedy); 0 disables")
    args = ap.parse_args()
    if args.quick:
        args.n_train, args.n_eval = 48, 24
        args.epochs = min(args.epochs, 8)
        args.soft_epochs = min(args.soft_epochs, 2)

    # Wedge-proofing (VERDICT r4 next #2): bounded TPU probe + CPU pin on
    # failure BEFORE jax backend init, incremental atomic artifact writes
    # after every stage and eval batch, and (at the bottom of the file) a
    # one-shot fresh-process body retry — the bench.py treatment for the
    # harness whose round-4 full-scale output was lost to a mid-run wedge.
    from benchmarks.harness import ArtifactWriter, Watchdog, decide_platform
    decide_platform()
    from tpuasr.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    aw = ArtifactWriter(args.out)
    # Hang watchdog: a post-probe tunnel wedge stalls a device op forever
    # (no exception — body retry can't see it); abort so an outer loop can
    # relaunch against the persistent compile cache.
    wd = Watchdog(900.0, "wer_delta")

    import jax
    import jax.numpy as jnp

    from tpuasr import native
    from tpuasr.data import AudioLoader, LoaderConfig, make_word_corpus
    from tpuasr.decode import (BeamSearchConfig, Lexicon, LexiconDecoder,
                               SymbolTable, ctc_beam_search, get_beam_search,
                               greedy_decode)
    from tpuasr.features import FeatureConfig
    from tpuasr.lm import train_ngram
    from tpuasr.train import TrainConfig, Trainer
    from tpuasr.utils.metrics import wer

    V = 14                       # phone inventory incl. blank
    tmp = Path(tempfile.mkdtemp(prefix="werdelta_"))
    mk = dict(vocab_size=V, num_words=40, words_per_utt=(3, 8),
              pron_len=(2, 4), tone_ms=(80.0, 140.0), noise=(0.25, 0.6),
              confusable_hz=35.0, freq_jitter_hz=10.0, markov=0.5,
              homophones=8)
    train_c = make_word_corpus(tmp / "train", num_utts=args.n_train,
                               seed=11, **mk)
    eval_c = make_word_corpus(tmp / "eval", num_utts=args.n_eval, seed=23,
                              split="eval", word_prons=train_c.word_prons,
                              **mk)
    n_dev = max(24, args.n_eval // 4) if not args.quick else 16
    dev_c = make_word_corpus(tmp / "dev", num_utts=n_dev, seed=37,
                             split="dev", word_prons=train_c.word_prons,
                             **mk)

    max_label = 8 * 4            # words_per_utt max * pron_len max
    # ONE bucket, boundary rounded to 1 s: a single stable train/eval shape
    # (each fresh shape costs minutes of remote compile on the axon
    # terminal; 6 default buckets made the round-3 first run time out).
    lcfg = LoaderConfig(batch_size=16, max_label_len=max_label,
                        max_buckets=1, bucket_quantum=8000)
    train_loader = AudioLoader(train_c.manifest, lcfg)
    eval_lcfg = LoaderConfig(batch_size=16, max_label_len=max_label,
                             max_buckets=1, bucket_quantum=8000,
                             shuffle=False)
    eval_loader = AudioLoader(eval_c.manifest, eval_lcfg)
    dev_loader = AudioLoader(dev_c.manifest, eval_lcfg)
    cfg = TrainConfig(model="deepspeech_ctc", num_classes=V,
                      model_kwargs=dict(rnn_hidden=96, rnn_layers=2,
                                        conv_channels=16, dropout=0.0),
                      lr=3e-3, num_epochs=args.epochs, warmup_steps=40,
                      log_every=10 ** 9)
    trainer = Trainer(cfg, FeatureConfig(n_mels=40))
    state = trainer.init_state(
        train_loader.make_batch(train_loader.batch_plan(0)[0]))
    soft_variables = None
    for epoch in range(cfg.num_epochs):
        if epoch == args.soft_epochs and args.soft_epochs > 0:
            soft_variables = jax.device_put(jax.device_get(
                {"params": state.params,
                 "batch_stats": state.batch_stats}))
        train_loader.epoch = epoch
        for batch in train_loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
            wd.beat()
        # Per-epoch sync: an async dispatch queue can hide a wedge from
        # the watchdog for many epochs; a scalar pull keeps beats honest.
        float(m["loss"])
    print(f"# final train loss {float(m['loss']):.3f}", file=sys.stderr)
    aw.update(backend=jax.default_backend(),
              final_train_loss=round(float(m["loss"]), 4),
              n_eval_utts_planned=args.n_eval)
    aw.flush(stage="trained")

    # Phone bigram/trigram G trained from the TRAIN transcripts (the
    # reference's grammar was likewise estimated from corpus text).
    texts = [u.tokens for u in train_loader.utts]
    syms = [str(i) for i in range(V)]
    lm2 = train_ngram([[syms[t] for t in ts] for ts in texts], order=2)
    lm3 = train_ngram([[syms[t] for t in ts] for ts in texts], order=3)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Variables are a jit ARGUMENT (never a captured constant — the axon
    # terminal's dispatch degrades permanently under multi-MB captured
    # device constants) and the same executable serves both operating
    # points (converged + soft).
    @jax.jit
    def forward(vs, wav, lens):
        feats, flens = trainer.featurizer._featurize(wav, lens)
        return trainer.model.apply(vs, feats, flens, train=False)

    if args.inject_bug:
        # One-line beam-scoring bug: merge by MAX path probability instead
        # of the logsumexp the CTC prefix recursion requires. The harness
        # must move measurably under this, or it cannot see beam bugs.
        import tpuasr.decode.prefix_beam as _pb
        _pb._logaddexp = lambda a, b: jnp.maximum(a, b)

    bs_cfg = BeamSearchConfig(beam_width=8, class_topk=6, max_len=64)
    fused_cfg = BeamSearchConfig(beam_width=8, class_topk=6, max_len=64)
    # Like-for-like Pallas parity gate (VERDICT r4 next #7): the kernel
    # searches ALL classes, so its gate partner is the XLA beam at the
    # SAME class set (class_topk = C-1); the kernel-vs-pruned-XLA number
    # stays as a separate informational (cross-space) column.
    bsf_cfg = BeamSearchConfig(beam_width=8, class_topk=V - 1, max_len=64)
    # Full-width graph-constrained search: every class visible per step
    # (class selection is per-beam and graph-aware, so P = C-1 keeps all).
    gb_cfg = BeamSearchConfig(beam_width=8, class_topk=V - 1, max_len=64)
    # Pruned graph arm (VERDICT r4 next #4): per-beam selection masks
    # graph-forbidden classes BEFORE top_k, so P=8 searches the 8 best
    # LEGAL classes — the serving operating point; its WER and agreement
    # vs the full-width arm are measured below (graph_prune_* columns).
    gbp_cfg = BeamSearchConfig(beam_width=8, class_topk=8, max_len=64)
    big = lm2.fusion_matrix(syms)
    eos2 = lm2.eos_vector(syms)
    tri = lm3.fusion_tensor3(syms)
    eos3 = lm3.eos_matrix(syms)
    pallas_beam = get_beam_search("pallas")

    # First-pass WFST decode (the latgen path): the TL graph built from
    # the SAME lexicon drives the search (host C++ token passing); word
    # olabels are 1-based over words.txt order (lexicon_to_fst).
    from tpuasr.decode import (GraphTables, compile_graph_tables, compose,
                               graph_tokens_to_words, lexicon_to_fst,
                               ngram_to_fst, wfst_ctc_decode,
                               wfst_ctc_decode_nbest)
    tl_fst = lexicon_to_fst(train_c.word_prons)
    # In-repo mkgraph (VERDICT r3 #4): word-bigram G from the TRAIN
    # transcripts, LG = L o G. Word labels are 1-based word ids, matching
    # lexicon_to_fst's olabels.
    wsym2label = {w: i + 1 for i, (w, _) in enumerate(train_c.word_prons)}
    lm_word = train_ngram([u.text.split() for u in train_loader.utts],
                          order=2)
    g_fst = ngram_to_fst(lm_word, wsym2label)
    lg_fst = compose(tl_fst, g_fst)
    tabs_tl = compile_graph_tables(tl_fst, V)
    # LG with homophones is non-twin (exact determinization diverges —
    # the case Kaldi adds disambiguation symbols for): determinize with
    # pruning + coarse residual quantization (keeps the table ~20k states;
    # drift <=quantum/2 per phone only STEERS the search); exact
    # words/scores come from replay through lg_fst itself (replay_words).
    tabs_lg = compile_graph_tables(lg_fst, V, max_states=400_000,
                                   prune=10.0, quantum=0.1)
    print(f"# graphs: TL {tl_fst.num_states} states -> det "
          f"{tabs_tl.num_states}; LG {lg_fst.num_states} -> det "
          f"{tabs_lg.num_states}", file=sys.stderr)
    aw.update(graph_states_tl=tabs_tl.num_states,
              graph_states_lg=tabs_lg.num_states)
    aw.flush(stage="graphs_built")

    # Jitted device decoders; fusion/graph WEIGHTS are traced arguments so
    # the dev sweeps below reuse one executable per decoder (fresh
    # executables cost minutes on the axon terminal). LM/graph tables ride
    # as jit arguments, never captured constants (axon pathology #1).
    @jax.jit
    def beam_plain_j(lp, ol):
        return ctc_beam_search(lp, ol, bs_cfg)

    @jax.jit
    def beam_full_j(lp, ol):
        return ctc_beam_search(lp, ol, bsf_cfg)

    @jax.jit
    def beam_fused2_j(lp, ol, tab, eos, w):
        return ctc_beam_search(lp, ol, fused_cfg, lm_bigram=tab,
                               lm_eos=eos, lm_weight=w)

    @jax.jit
    def beam_fused3_j(lp, ol, tab, eos, w):
        return ctc_beam_search(lp, ol, fused_cfg, lm_trigram=tab,
                               lm_eos=eos, lm_weight=w)

    def make_graph_beam(start, cfg=gb_cfg):
        @jax.jit
        def f(lp, ol, nxt, cost, fin, w):
            return ctc_beam_search(
                lp, ol, cfg, graph=GraphTables(nxt, cost, fin, start),
                graph_weight=w)
        return f

    graph_beam_tl = make_graph_beam(tabs_tl.start)
    graph_beam_lg = make_graph_beam(tabs_lg.start)
    graph_beam_lg_p = make_graph_beam(tabs_lg.start, gbp_cfg)
    tl_dev = tuple(jnp.asarray(x) for x in
                   (tabs_tl.next_state, tabs_tl.cost, tabs_tl.final))
    lg_dev = tuple(jnp.asarray(x) for x in
                   (tabs_lg.next_state, tabs_lg.cost, tabs_lg.final))
    big_d, eos2_d = jnp.asarray(big), jnp.asarray(eos2)
    tri_d, eos3_d = jnp.asarray(tri), jnp.asarray(eos3)

    words = SymbolTable.load(train_c.words_txt)
    phones = SymbolTable.from_list(train_c.vocab)
    lex = Lexicon.load(train_c.lexicon, words, phones)
    lexdec = LexiconDecoder(lex)

    def replay_words(fst, hyps):
        """Phone hypotheses -> word ids via min-cost transduction through
        the ORIGINAL graph; trie-lexicon fallback for hypotheses whose
        graph state never reached a final (partial-hypothesis fallback)."""
        out = []
        for h in hyps:
            cost, ols = fst.score(h)
            out.append(lexdec.decode(h) if math.isinf(cost)
                       else [int(o) - 1 for o in ols])
        return out

    # ---- dev-split weight tuning (VERDICT r3 #5: tuned, NEVER on eval) --
    dev_batches, dev_word_refs = [], []
    dev_utts = {u.id: u for u in dev_loader.utts}
    for batch in dev_loader:
        lp, ol = forward(variables, jnp.asarray(batch["wav"]),
                         jnp.asarray(batch["wav_lens"]))
        dev_batches.append((lp, ol, np.asarray(lp, np.float32),
                            np.asarray(ol, np.int32), batch["real"]))
        for j in range(len(batch["real"])):
            if batch["real"][j]:
                dev_word_refs.append(
                    [words[w]
                     for w in dev_utts[batch["ids"][j]].text.split()])

    def device_hyps(fn, *extra):
        out_h = []
        for lp, ol, _, _, real in dev_batches:
            o = fn(lp, ol, *extra)
            toks = np.asarray(o["tokens"])
            tlens = np.asarray(o["token_lens"])
            out_h.extend(toks[j, 0][:tlens[j, 0]].tolist()
                         for j in range(len(real)) if real[j])
            wd.beat()
        return out_h

    def host_fst_hyps(fst, asc):
        out_h = []
        for _, _, lp_np, ol_np, real in dev_batches:
            fd = wfst_ctc_decode(fst, lp_np, ol_np, beam=12.0,
                                 max_active=500, acoustic_scale=asc)
            out_h.extend(
                [int(w) - 1
                 for w in fd["words"][j, :int(fd["word_lens"][j])]]
                for j in range(len(real)) if real[j])
        return out_h

    def tune(grid, hyps_for):
        best_w, best_wer = None, math.inf
        for w in grid:
            score = wer(dev_word_refs, hyps_for(w))
            if score < best_wer:
                best_w, best_wer = w, score
        return best_w, best_wer

    w2_tuned, _ = tune(
        (0.2, 0.4, 0.7, 1.0),
        lambda w: [lexdec.decode(h) for h in device_hyps(
            beam_fused2_j, big_d, eos2_d, jnp.float32(w))])
    w3_tuned, _ = tune(
        (0.2, 0.4, 0.7, 1.0, 1.5),
        lambda w: [lexdec.decode(h) for h in device_hyps(
            beam_fused3_j, tri_d, eos3_d, jnp.float32(w))])
    gw_tuned, _ = tune(
        (0.5, 1.0, 1.5),
        lambda w: replay_words(lg_fst, device_hyps(
            graph_beam_lg, *lg_dev, jnp.float32(w))))
    asc_tuned, _ = tune((0.7, 1.0, 1.4),
                        lambda a: host_fst_hyps(lg_fst, a))
    print(f"# tuned on dev: lm_w2={w2_tuned} lm_w3={w3_tuned} "
          f"graph_w_lg={gw_tuned} asc_lg={asc_tuned}", file=sys.stderr)
    aw.update(lm_w2_tuned=w2_tuned, lm_w3_tuned=w3_tuned,
              graph_w_lg_tuned=gw_tuned, asc_lg_tuned=asc_tuned)
    aw.flush(stage="dev_tuned")

    ARM_NAMES = (("g", "greedy"), ("bx", "beam_xla"),
                 ("bxf", "beam_xla_full"), ("bp", "beam_pallas"),
                 ("f2", "fused_bigram"), ("f3", "fused_trigram"),
                 ("hb", "beam_cpp"), ("hg", "greedy_cpp"),
                 ("gt", "graph_beam_tl"), ("gl", "graph_beam_lg"),
                 ("glp", "graph_beam_lg_pruned"))
    ARMS = tuple(k for k, _ in ARM_NAMES)
    hyp = {k: [] for k in ARMS}
    word_hyps = {k: [] for k in ARMS}  # word-id hyps, built per batch
    refs = []            # phone-token references
    word_refs = []       # word-id references
    word_hyp_fst = []    # word-id hypotheses straight off the TL graph
    word_hyp_fst_lg = []  # ... and off the composed LG graph
    fst_nbest = []       # lattice n-best word-id hypotheses (oracle WER)
    fst_conf = []        # mean best-hyp word confidence per utterance
    n_fst_final = 0
    n_gb_final = {"gt": 0, "gl": 0}
    utt_by_id = {u.id: u for u in eval_loader.utts}
    use_native = native.available()

    # Timed arms (VERDICT r3 #2: every WER must carry an RTF). Device arms
    # are warmed above (dev tuning) or here so compile time never lands in
    # a timer; drain by host transfer (the only honest fence on axon).
    import time as _time
    wlp, wol = dev_batches[0][0], dev_batches[0][1]
    np.asarray(beam_plain_j(wlp, wol)["tokens"])
    np.asarray(graph_beam_tl(wlp, wol, *tl_dev, jnp.float32(1.0))["tokens"])
    np.asarray(graph_beam_lg(wlp, wol, *lg_dev,
                             jnp.float32(gw_tuned))["tokens"])
    np.asarray(graph_beam_lg_p(wlp, wol, *lg_dev,
                               jnp.float32(gw_tuned))["tokens"])
    tm = dict(beam=0.0, gb_tl=0.0, gb_lg=0.0, gb_lgp=0.0, fst_tl=0.0,
              fst_lg=0.0, nbest_tl=0.0, nbest_lg=0.0)
    audio_s = 0.0
    SR = train_c.sample_rate

    def timed(key, fn, *a, **kw):
        t0 = _time.perf_counter()
        r = fn(*a, **kw)
        if isinstance(r, dict) and hasattr(r.get("tokens"), "device"):
            np.asarray(r["tokens"])          # drain the device queue
        tm[key] += _time.perf_counter() - t0
        return r

    for batch in eval_loader:
        logp, out_lens = forward(variables, jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_lens"]))
        g_t, g_l = greedy_decode(logp, out_lens)
        o_bx = timed("beam", beam_plain_j, logp, out_lens)
        o_gt = timed("gb_tl", graph_beam_tl, logp, out_lens, *tl_dev,
                     jnp.float32(1.0))
        o_gl = timed("gb_lg", graph_beam_lg, logp, out_lens, *lg_dev,
                     jnp.float32(gw_tuned))
        o_glp = timed("gb_lgp", graph_beam_lg_p, logp, out_lens, *lg_dev,
                      jnp.float32(gw_tuned))
        outs = {
            "bx": o_bx,
            "bxf": beam_full_j(logp, out_lens),
            "bp": pallas_beam(logp, out_lens, bs_cfg),
            "f2": beam_fused2_j(logp, out_lens, big_d, eos2_d,
                                jnp.float32(w2_tuned)),
            "f3": beam_fused3_j(logp, out_lens, tri_d, eos3_d,
                                jnp.float32(w3_tuned)),
            "gt": o_gt,
            "gl": o_gl,
            "glp": o_glp,
        }
        lp_np = np.asarray(logp, np.float32)
        ol_np = np.asarray(out_lens, np.int32)
        if use_native:
            hb = native.ctc_beam_search_host(lp_np, ol_np, beam_width=8,
                                             class_topk=6, max_len=64)
            hg_t, hg_l = native.ctc_greedy_host(lp_np, ol_np)
        fd = timed("fst_tl", wfst_ctc_decode, tl_fst, lp_np, ol_np,
                   beam=12.0, max_active=500)
        fdl = timed("fst_lg", wfst_ctc_decode, lg_fst, lp_np, ol_np,
                    beam=12.0, max_active=500, acoustic_scale=asc_tuned)
        # Lattice n-best (native/wfst_lattice.cc): oracle WER over the
        # top-10 measures lattice quality the way Kaldi's oracle tool
        # does; the best-hyp word posteriors feed a calibration check.
        nb = timed("nbest_tl", wfst_ctc_decode_nbest, tl_fst, lp_np,
                   ol_np, beam=12.0, max_active=500, lat_beam=8.0,
                   nbest=10)
        for j in range(len(batch["real"])):
            if not batch["real"][j]:
                continue
            audio_s += float(batch["wav_lens"][j]) / SR
            nf = int(fd["word_lens"][j])
            word_hyp_fst.append([int(w) - 1
                                 for w in fd["words"][j, :nf]])
            n_fst_final += int(bool(fd["reached_final"][j]))
            nfl = int(fdl["word_lens"][j])
            word_hyp_fst_lg.append([int(w) - 1
                                    for w in fdl["words"][j, :nfl]])
            hyps_j = []
            for i in range(int(nb["nhyp"][j])):
                L = int(nb["word_lens"][j, i])
                hyps_j.append([int(w) - 1 for w in nb["words"][j, i, :L]])
            fst_nbest.append(hyps_j or [[]])
            L0 = int(nb["word_lens"][j, 0])
            fst_conf.append(float(nb["confidences"][j, :L0].mean())
                            if L0 else 1.0)
            refs.append(batch["tokens"][j][:batch["token_lens"][j]].tolist())
            word_refs.append([words[w] for w in
                              utt_by_id[batch["ids"][j]].text.split()])
            hyp["g"].append(np.asarray(g_t)[j][:int(g_l[j])].tolist())
            for k, o in outs.items():
                hyp[k].append(np.asarray(o["tokens"])[j, 0]
                              [:int(o["token_lens"][j, 0])].tolist())
            for k, o in (("gt", o_gt), ("gl", o_gl)):
                n_gb_final[k] += int(bool(
                    np.asarray(o["reached_final"])[j, 0]))
            if use_native:
                hyp["hb"].append(hb["tokens"][j][:hb["token_lens"][j]]
                                 .tolist())
                hyp["hg"].append(hg_t[j][:hg_l[j]].tolist())

        # Incremental word decode + partial artifact flush: a kill or
        # wedge after this batch keeps every arm's WER over the
        # utterances scored so far (VERDICT r4 weak #3).
        lo = len(word_hyps["g"])
        lex_arms = ["g", "bx", "bxf", "bp", "f2", "f3"]
        if use_native:
            lex_arms += ["hb", "hg"]
        for k in lex_arms:
            word_hyps[k].extend(lexdec.decode(h) for h in hyp[k][lo:])
        # Graph-beam arms recover words by min-cost replay through their
        # OWN graph (grammar included for LG) — the device analog of
        # latgen's olabel output, not a post-hoc trie segmentation.
        word_hyps["gt"].extend(replay_words(tl_fst, hyp["gt"][lo:]))
        word_hyps["gl"].extend(replay_words(lg_fst, hyp["gl"][lo:]))
        word_hyps["glp"].extend(replay_words(lg_fst, hyp["glp"][lo:]))
        aw.update(
            n_eval_done=len(refs),
            wer_fst_decode=round(wer(word_refs, word_hyp_fst), 4),
            wer_fst_decode_lg=round(wer(word_refs, word_hyp_fst_lg), 4),
            **{f"wer_{nm}": round(wer(word_refs, word_hyps[k]), 4)
               for k, nm in ARM_NAMES if word_hyps[k]})
        aw.flush(stage="eval")
        wd.beat()

    def decode_pass(vs, beam_only=False, fwd=None):
        """greedy + XLA-beam + Pallas-beam hypotheses for one param set."""
        fwd = forward if fwd is None else fwd
        o = {"g": [], "bx": [], "bp": []}
        for batch in eval_loader:
            logp, out_lens = fwd(vs, jnp.asarray(batch["wav"]),
                                 jnp.asarray(batch["wav_lens"]))
            g_t, g_l = greedy_decode(logp, out_lens)
            dec = {"bx": ctc_beam_search(logp, out_lens, bs_cfg)}
            if not beam_only:
                dec["bp"] = pallas_beam(logp, out_lens, bs_cfg)
            for j in range(len(batch["real"])):
                if not batch["real"][j]:
                    continue
                o["g"].append(np.asarray(g_t)[j][:int(g_l[j])].tolist())
                for k, d in dec.items():
                    o[k].append(np.asarray(d["tokens"])[j, 0]
                                [:int(d["token_lens"][j, 0])].tolist())
            wd.beat()
        return o

    # SOFT operating point: the converged AM's posteriors are near one-hot
    # (train loss ~1e-3) so beam == greedy by construction; at the soft
    # snapshot the lattice is still ambiguous and beam search must WIN.
    soft_hyp = (decode_pass(soft_variables)
                if soft_variables is not None else None)

    # In-run bug injection on the CONVERGED model (merge logsumexp -> max):
    # proves this harness moves under a 1-line beam-scoring bug even when
    # --inject-bug wasn't passed. ctc_beam_search re-traces per call, so
    # the patch takes effect immediately; restored right after.
    bug_hyp = None
    if not args.inject_bug:
        import tpuasr.decode.prefix_beam as _pb
        _orig = _pb._logaddexp
        _pb._logaddexp = lambda a, b: jnp.maximum(a, b)
        try:
            bug_hyp = decode_pass(
                soft_variables if soft_variables is not None else variables,
                beam_only=True)
        finally:
            _pb._logaddexp = _orig

    ter = {k: wer(refs, v) for k, v in hyp.items() if v}
    # Word-level WER: phone hypotheses -> word sequences through the lexicon
    # (the L of the reference's TLG), scored against the word transcripts;
    # word_hyps was built incrementally inside the eval loop.
    n_words = sum(len(r) for r in word_refs)
    wwer = {k: wer(word_refs, v) for k, v in word_hyps.items() if v}
    out = {"metric": "wer_delta_beam_vs_greedy",
           "value": round(wwer["bx"] - wwer["g"], 4), "unit": "absolute",
           "n_eval_utts": len(refs), "n_ref_words": n_words,
           "wer_ci95": round(_ci95(wwer["g"], n_words), 4),
           "backend": jax.default_backend(),
           "injected_bug": bool(args.inject_bug)}
    for k, name in ARM_NAMES:
        if k in wwer:
            out[f"wer_{name}"] = round(wwer[k], 4)
        if k in ter:
            out[f"ter_{name}"] = round(ter[k], 4)
    out["delta_ci95_paired"] = round(_paired_delta_ci95(
        word_refs, word_hyps["bx"], word_hyps["g"]), 4)
    # First-pass graph decode vs beam+trie-lexicon: same L, different
    # search (joint acoustic-lexicon Viterbi vs collapse-then-segment).
    out["wer_fst_decode"] = round(wer(word_refs, word_hyp_fst), 4)
    out["fst_vs_beam_delta"] = round(
        out["wer_fst_decode"] - wwer["bx"], 4)
    out["fst_final_frac"] = round(n_fst_final / max(len(refs), 1), 4)
    # Grammar-bearing first pass (LG) + the round-4 flagship comparison:
    # device graph-constrained beam vs the host LG first pass (north star:
    # within 0.2% absolute, at a measured on-chip RTF).
    out["wer_fst_decode_lg"] = round(wer(word_refs, word_hyp_fst_lg), 4)
    out["lg_gain_host"] = round(
        out["wer_fst_decode"] - out["wer_fst_decode_lg"], 4)
    out["lg_gain_ci95_paired"] = round(_paired_delta_ci95(
        word_refs, word_hyp_fst, word_hyp_fst_lg), 4)
    out["graph_beam_vs_fst_tl"] = round(
        wwer["gt"] - out["wer_fst_decode"], 4)
    out["graph_beam_vs_fst_lg"] = round(
        wwer["gl"] - out["wer_fst_decode_lg"], 4)
    out["graph_beam_lg_ci95_paired"] = round(_paired_delta_ci95(
        word_refs, word_hyps["gl"], word_hyp_fst_lg), 4)
    out["graph_gain_device"] = round(wwer["bx"] - wwer["gl"], 4)
    out["graph_gain_ci95_paired"] = round(_paired_delta_ci95(
        word_refs, word_hyps["bx"], word_hyps["gl"]), 4)
    out["gb_tl_final_frac"] = round(n_gb_final["gt"] / max(len(refs), 1), 4)
    out["gb_lg_final_frac"] = round(n_gb_final["gl"] / max(len(refs), 1), 4)
    # Pruned graph arm (serving operating point, class_topk=8): WER delta
    # + token agreement vs the full-width graph beam on a TRAINED AM —
    # the accuracy gate for the class-pruned search bench.py times at
    # serving scale (bench graph_prune_agree is noise-floor only: an
    # untrained AM on random audio).
    out["graph_prune_wer_delta"] = round(wwer["glp"] - wwer["gl"], 4)
    out["graph_prune_delta_ci95_paired"] = round(_paired_delta_ci95(
        word_refs, word_hyps["glp"], word_hyps["gl"]), 4)
    out["graph_prune_agree"] = round(float(np.mean(
        [a == b for a, b in zip(hyp["glp"], hyp["gl"])])), 4)
    # Measured decode throughput per arm (VERDICT r3 #2): x realtime on
    # this backend at the eval shapes (B=16); host arms are C++ over
    # os.cpu_count() threads. The device arms' serving-scale numbers live
    # in bench.py (B=128); these put a speed next to every WER above.
    import os as _os
    out["host_threads"] = _os.cpu_count()
    out["eval_audio_s"] = round(audio_s, 1)
    for key, name in (("beam", "beam_xla"), ("gb_tl", "graph_beam_tl"),
                      ("gb_lg", "graph_beam_lg"),
                      ("gb_lgp", "graph_beam_lg_pruned"),
                      ("fst_tl", "fst_decode"),
                      ("fst_lg", "fst_decode_lg"),
                      ("nbest_tl", "fst_nbest")):
        if tm.get(key):
            out[f"rtf_{name}"] = round(audio_s / tm[key], 1)
    out["lm_w2_tuned"] = w2_tuned
    out["lm_w3_tuned"] = w3_tuned
    out["graph_w_lg_tuned"] = gw_tuned
    out["asc_lg_tuned"] = asc_tuned
    out["homophones"] = mk["homophones"]
    out["markov"] = mk["markov"]
    # Lattice quality: oracle WER over the top-10 n-best (per-utterance
    # min edit distance, Kaldi lattice-oracle style) and confidence
    # calibration (best-hyp word posteriors should be higher on correct
    # utterances than on errorful ones).
    from tpuasr.utils.metrics import edit_distance
    o_err = o_len = 0
    conf_ok, conf_bad = [], []
    for ref, hyps_j, cf in zip(word_refs, fst_nbest, fst_conf):
        per = [edit_distance(ref, h) for h in hyps_j]
        o_err += min(per)
        o_len += max(len(ref), 1)
        (conf_ok if per[0] == 0 else conf_bad).append(cf)
    out["wer_fst_nbest_oracle"] = round(o_err / max(o_len, 1), 4)
    if conf_ok:
        out["fst_conf_correct"] = round(float(np.mean(conf_ok)), 4)
    if conf_bad:
        out["fst_conf_errorful"] = round(float(np.mean(conf_bad)), 4)
    if soft_hyp is not None:
        soft_words = {k: [lexdec.decode(h) for h in v]
                      for k, v in soft_hyp.items()}
        soft_wwer = {k: wer(word_refs, v) for k, v in soft_words.items()}
        out["soft_epochs"] = args.soft_epochs
        out["wer_greedy_soft"] = round(soft_wwer["g"], 4)
        out["wer_beam_soft"] = round(soft_wwer["bx"], 4)
        out["wer_beam_pallas_soft"] = round(soft_wwer["bp"], 4)
        out["soft_delta_beam_vs_greedy"] = round(
            soft_wwer["bx"] - soft_wwer["g"], 4)
        out["soft_delta_ci95_paired"] = round(_paired_delta_ci95(
            word_refs, soft_words["bx"], soft_words["g"]), 4)
    if bug_hyp is not None:
        bug_words = [lexdec.decode(h) for h in bug_hyp["bx"]]
        base = out.get("wer_beam_soft", out["wer_beam_xla"])
        out["wer_beam_bugged"] = round(wer(word_refs, bug_words), 4)
        out["bug_moves_wer"] = round(out["wer_beam_bugged"] - base, 4)
    if args.int8:
        # Quantized serving path on the SAME checkpoint: int8 MXU input
        # projections (gru_scan_xfused_q8). The delta vs the f32 decode is
        # the cost of quantization at the north star's WER resolution.
        from tpuasr.models import create_model
        m_q8 = create_model("deepspeech_ctc", num_classes=V,
                            **{**cfg.model_kwargs, "pallas_gru": True,
                               "fused_proj": True, "int8_proj": True})

        @jax.jit
        def forward_q8(vs, wav, lens):
            feats, flens = trainer.featurizer._featurize(wav, lens)
            return m_q8.apply(vs, feats, flens, train=False)

        q8 = decode_pass(variables, beam_only=True, fwd=forward_q8)
        q8_words = {k: [lexdec.decode(h) for h in v]
                    for k, v in q8.items() if v}
        out["wer_int8_greedy"] = round(wer(word_refs, q8_words["g"]), 4)
        out["wer_int8_beam"] = round(wer(word_refs, q8_words["bx"]), 4)
        out["int8_delta_greedy"] = round(
            out["wer_int8_greedy"] - wwer["g"], 4)
        out["int8_delta_beam"] = round(
            out["wer_int8_beam"] - wwer["bx"], 4)
        out["int8_delta_ci95_paired"] = round(_paired_delta_ci95(
            word_refs, q8_words["bx"], word_hyps["bx"]), 4)
        if args.int8_rec:
            m_q8r = create_model("deepspeech_ctc", num_classes=V,
                                 **{**cfg.model_kwargs, "pallas_gru": True,
                                    "fused_proj": True, "int8_rec": True})

            @jax.jit
            def forward_q8r(vs, wav, lens):
                feats, flens = trainer.featurizer._featurize(wav, lens)
                return m_q8r.apply(vs, feats, flens, train=False)

            q8r = decode_pass(variables, beam_only=True, fwd=forward_q8r)
            q8r_words = {k: [lexdec.decode(h) for h in v]
                         for k, v in q8r.items() if v}
            out["wer_int8rec_greedy"] = round(
                wer(word_refs, q8r_words["g"]), 4)
            out["wer_int8rec_beam"] = round(
                wer(word_refs, q8r_words["bx"]), 4)
            out["int8rec_delta_beam"] = round(
                out["wer_int8rec_beam"] - wwer["bx"], 4)
    out["lm_gain_bigram"] = round(wwer["bx"] - wwer["f2"], 4)
    out["lm_gain_trigram"] = round(wwer["bx"] - wwer["f3"], 4)
    # Like-for-like kernel parity gate (VERDICT r4 next #7): the Pallas
    # kernel searches ALL classes, so its gate partner is the XLA beam at
    # the SAME class set (class_topk=C-1). The kernel-vs-pruned-XLA
    # number stays as an informational cross-space column — divergence
    # there is a search-space property (all-C vs top-6), not a kernel
    # regression, and must not excuse one.
    out["pallas_vs_xla_agree"] = round(float(np.mean(
        [a == b for a, b in zip(hyp["bp"], hyp["bxf"])])), 4)
    out["pallas_vs_xla_agree_crossspace"] = round(float(np.mean(
        [a == b for a, b in zip(hyp["bp"], hyp["bx"])])), 4)
    if hyp["hb"]:
        out["device_vs_cpp_greedy_agree"] = round(float(np.mean(
            [g == h for g, h in zip(hyp["g"], hyp["hg"])])), 4)
        out["device_vs_cpp_beam_agree"] = round(float(np.mean(
            [b == h for b, h in zip(hyp["bx"], hyp["hb"])])), 4)
    wd.close()
    aw.update(**out)
    line = aw.finish()
    print(line)


if __name__ == "__main__":
    from benchmarks.harness import run_with_body_retry
    sys.exit(run_with_body_retry(lambda: main() or 0, __file__,
                                 "TPUASR_WERDELTA_REEXEC"))
