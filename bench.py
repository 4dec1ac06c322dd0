#!/usr/bin/env python
"""Headline benchmark (BASELINE config #5): end-to-end batched decode —
fused featurizer -> acoustic model -> on-device CTC beam search — on an
ASpIRE-style synthetic eval batch (8 kHz). Prints ONE JSON line:

  {"metric": "decode_rtf_x", "value": <x real-time per chip>,
   "unit": "x_realtime", "vs_baseline": <value / 50>}

The baseline is the north-star target from BASELINE.json: >= 50x real-time
batched decode per v5e chip (the reference publishes no numbers of its own —
BASELINE.md). value = seconds of audio decoded per wall-clock second.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    # Wedged-tunnel guard: a CPU fallback (labeled in the JSON) beats an
    # unbounded hang under the driver — see tpuasr/utils/tpu_probe.py.
    # Round 4: bounded retries with backoff (~13 min worst case) so a
    # *transient* wedge no longer costs the round its chip artifact the
    # way BENCH_r03.json did (VERDICT r3 weak #1 / next #3).
    from tpuasr.utils.tpu_probe import probe_tpu_retry

    want_cpu = os.environ.get("TPUASR_PLATFORM") == "cpu"
    tpu_ok = (not want_cpu) and probe_tpu_retry()
    if not tpu_ok and os.environ.get("TPUASR_REQUIRE_TPU") == "1":
        # Artifact-capture mode (benchmarks/capture_r05.py): skip the CPU
        # fallback — the orchestrator wants to wait the tunnel out.
        print("bench: TPU required but probe failed; exiting 43",
              file=sys.stderr, flush=True)
        return 43

    import jax

    if not tpu_ok:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized by the embedding process

    # AFTER the platform decision: on the CPU fallback the persistent cache
    # stays off (XLA:CPU (de)serialization instability — compile_cache.py).
    from tpuasr.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from tpuasr.decode import BeamSearchConfig, get_beam_search
    from tpuasr.features import FeatureConfig, Featurizer
    from tpuasr.models import create_model

    B = 128                     # utterances per batch (throughput-optimal
                                # on v5e: 32->7641x, 64->9162x, 128->9658x RT)
    if "--batch" in sys.argv:   # A/B harness: bench.py --batch 256
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    if jax.default_backend() != "tpu":
        B = min(B, 2)           # bounded-time CPU fallback (single core):
                                # the JSON is labeled backend=cpu
    SECONDS = 10.0              # per utterance
    SR = 8000
    NUM_CLASSES = 64            # ASpIRE-style phone inventory scale
    S = int(SR * SECONDS)
    on_tpu = jax.default_backend() == "tpu"

    feat_cfg = FeatureConfig(sample_rate=SR, n_mels=64)
    if on_tpu:
        from tpuasr.features.pallas_fused import FusedFeaturizer
        fz = FusedFeaturizer(feat_cfg)
    else:
        fz = Featurizer(feat_cfg)
    # pallas_gru: VMEM-resident recurrent weights (compiled path only —
    # interpreter mode on CPU would be slower than the XLA scan);
    # fused_proj: input projection inside the kernel (xp never in HBM) —
    # measured AM 59.5 -> 44.7 ms at these shapes on v5e.
    # int8 quantized serving (proj + recurrence) is the DEFAULT on TPU:
    # chip-validated exact-grid/kernel==reference parity gates plus a
    # measured WER delta of -0.06% +/- 0.09% (paired CI) vs the same f32
    # checkpoint (WERDELTA_r03.json) — well inside the <=0.2% north star.
    # --fp32 serves the bf16/f32 path for the A/B (30,793x vs 33,017x RT).
    fp32 = "--fp32" in sys.argv or "--no-int8" in sys.argv
    int8 = not fp32
    int8_rec = int8 and "--no-int8-rec" not in sys.argv
    # conv2 int8 tap-GEMM (ops/pallas_conv.py): A/B flag until its WER
    # delta is recorded in the harness (the GRU int8 path's promotion
    # playbook — see WERDELTA --int8-conv columns once measured).
    int8_conv = "--int8-conv" in sys.argv
    model = create_model("deepspeech_ctc", num_classes=NUM_CLASSES,
                         rnn_hidden=512, rnn_layers=4, pallas_gru=on_tpu,
                         bf16_gru=on_tpu, fused_proj=on_tpu,
                         int8_proj=int8 and on_tpu,
                         int8_rec=int8_rec and on_tpu,
                         int8_conv=int8_conv and on_tpu)

    rng = np.random.default_rng(0)
    wav = rng.standard_normal((B, S)).astype(np.float32) * 0.1
    wav_lens = np.full((B,), S, np.int32)

    feats0, flens0 = fz(jnp.asarray(wav), jnp.asarray(wav_lens))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), feats0, flens0, train=False)

    bs_cfg = BeamSearchConfig(beam_width=8, class_topk=8, max_len=256)
    beam = get_beam_search("auto")

    @jax.jit
    def pipeline(variables, ftabs, wav, wav_lens):
        # Weights/featurizer tables ride as jit ARGUMENTS: closing over
        # multi-MB device constants permanently degrades dispatch on the
        # axon TPU terminal (~2 ms + transfer-scaled cost per call on every
        # later executable in the process).
        feats, flens = fz._featurize(wav, wav_lens, tables=ftabs)
        logp, out_lens = model.apply(variables, feats, flens, train=False)
        out = beam(logp, out_lens, bs_cfg)
        return out["tokens"], out["token_lens"], out["scores"]

    # Post-probe wedge insurance (the probe can pass and the tunnel die
    # seconds later): a 15-min no-progress watchdog aborts with exit 42 so
    # an outer queue (capture_r05.py) can re-probe and relaunch instead of
    # hanging to its subprocess timeout. Compiles are one-time (persistent
    # cache), so 900 s of true no-progress means a dead tunnel.
    from benchmarks.harness import Watchdog
    wd = Watchdog(900.0, "bench")

    ftabs = getattr(fz, "tables", None)
    wav_d = jnp.asarray(wav)
    lens_d = jnp.asarray(wav_lens)
    # Warmup / compile; np.asarray drain forces TRUE completion (under the
    # axon terminal, block_until_ready can return before execution in its
    # async-lazy mode — a host transfer drains the queue in every mode).
    out = pipeline(variables, ftabs, wav_d, lens_d)
    np.asarray(out[0][0, :1])
    wd.beat()

    # Timed runs: queue n_iter executions, then drain once.
    n_iter = 20 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = pipeline(variables, ftabs, wav_d, lens_d)
    np.asarray(out[0][0, :1])
    dt = (time.perf_counter() - t0) / n_iter
    wd.beat()

    audio_seconds = B * SECONDS
    rtf_x = audio_seconds / dt

    # Roofline accounting (VERDICT r1 item 4): XLA cost analysis of the
    # whole pipeline + analytic correction for the Pallas GRU matmuls
    # (custom calls report 0 flops). T_out = feature frames / conv stride 2.
    rl = {}
    try:
        from tpuasr.features.reference import num_frames
        from tpuasr.utils.profiling import (cost_analysis, gru_param_flops,
                                            roofline)
        ca = cost_analysis(pipeline, variables, ftabs, wav_d, lens_d)
        corr = (gru_param_flops(variables["params"], B,
                                -(-int(num_frames(feat_cfg, S)) // 2))
                if on_tpu else 0.0)  # CPU path runs the XLA scan (counted)
        rl = roofline(pipeline, (variables, ftabs, wav_d, lens_d), dt,
                      flops=ca["flops"] + corr, bytes_accessed=ca["bytes"])
    except Exception as e:
        rl = {"error": str(e)}

    # ---- graph-constrained serving arm (VERDICT r3 next #1/#2) ----------
    # The WER-winning decode carries the TLG-style graph constraint; its
    # speed must be measured AT SERVING SCALE next to the headline, on both
    # sides of the PCIe boundary: the device graph beam (XLA search, graph
    # state per beam, tables as jit args) and the host C++ WFST first pass
    # (the reference's architecture). Representative LG at this class
    # count: ~200-word lexicon composed with a word bigram.
    graph_cols = {}
    try:
        from tpuasr.decode import (GraphTables, compile_graph_tables,
                                   compose, ctc_beam_search, lexicon_to_fst,
                                   ngram_to_fst, wfst_ctc_decode)
        from tpuasr.lm import train_ngram

        grng = np.random.default_rng(7)
        prons, seen = [], set()
        while len(prons) < 200:
            p = tuple(int(v) for v in
                      grng.integers(1, NUM_CLASSES,
                                    size=int(grng.integers(2, 5))))
            if p not in seen:
                seen.add(p)
                prons.append((f"w{len(prons):03d}", p))
        sents = [[f"w{int(v):03d}" for v in
                  grng.integers(0, len(prons),
                                size=int(grng.integers(3, 9)))]
                 for _ in range(400)]
        lg = compose(lexicon_to_fst(prons),
                     ngram_to_fst(train_ngram(sents, order=2),
                                  {w: i + 1 for i, (w, _) in
                                   enumerate(prons)}))
        tabs = compile_graph_tables(lg, NUM_CLASSES, max_states=400_000,
                                    prune=10.0, quantum=0.1)
        # Graph-aware class pruning (VERDICT r4 next #4): selection is per
        # beam and masks graph-forbidden classes BEFORE top_k, so class_topk
        # can stay at the headline's 8 even though the graph alphabet is 63
        # — identical output wherever state out-degree <= 8, and verified
        # below against the full-width (class_topk=63) search on this batch
        # (graph_prune_agree).
        gb_cfg = BeamSearchConfig(beam_width=8, class_topk=8, max_len=256)
        gb_cfg_full = BeamSearchConfig(beam_width=8,
                                       class_topk=NUM_CLASSES - 1,
                                       max_len=256)

        def make_pipeline_graph(cfg, gather="xla"):
            @jax.jit
            def pipeline_graph(variables, ftabs, nxt, cost, fin, wav,
                               wav_lens):
                feats, flens = fz._featurize(wav, wav_lens, tables=ftabs)
                logp, out_lens = model.apply(variables, feats, flens,
                                             train=False)
                out = ctc_beam_search(
                    logp, out_lens, cfg,
                    graph=GraphTables(nxt, cost, fin, tabs.start),
                    graph_gather_impl=gather)
                return out["tokens"], out["token_lens"], out["scores"]
            return pipeline_graph

        pipeline_graph = make_pipeline_graph(gb_cfg)
        tab_args = tuple(jnp.asarray(x)
                         for x in (tabs.next_state, tabs.cost, tabs.final))
        g_out = pipeline_graph(variables, ftabs, *tab_args, wav_d, lens_d)
        np.asarray(g_out[0][0, :1])                       # compile + drain
        wd.beat()
        n_g = 10 if on_tpu else 2
        t0 = time.perf_counter()
        for _ in range(n_g):
            g_out = pipeline_graph(variables, ftabs, *tab_args, wav_d,
                                   lens_d)
        np.asarray(g_out[0][0, :1])
        g_dt = (time.perf_counter() - t0) / n_g
        graph_cols["graph_rtf_x"] = round(audio_seconds / g_dt, 2)
        graph_cols["graph_states"] = tabs.num_states
        graph_cols["graph_class_topk"] = gb_cfg.class_topk
        # Pruned-vs-full-width agreement gate: same tokens on this batch
        # (exact wherever out-degree <= P; measured, not assumed).
        gf_out = make_pipeline_graph(gb_cfg_full)(
            variables, ftabs, *tab_args, wav_d, lens_d)
        wd.beat()
        pr_t, pr_l = np.asarray(g_out[0]), np.asarray(g_out[1])
        fl_t, fl_l = np.asarray(gf_out[0]), np.asarray(gf_out[1])
        agree = [
            (pr_l[b, 0] == fl_l[b, 0]
             and (pr_t[b, 0, :pr_l[b, 0]] == fl_t[b, 0, :fl_l[b, 0]]).all())
            for b in range(pr_t.shape[0])]
        graph_cols["graph_prune_agree"] = round(float(np.mean(agree)), 4)

        # DMA-ring gather A/B (tpuasr/ops/pallas_gather.py): the graph
        # arm's dominant cost is the per-step scattered row fetch; this
        # times the same search with the Pallas ring replacing XLA's
        # gather. Chip-only (interpret mode in a 1000-step scan is not a
        # measurement); must be BIT-identical to the XLA-gather arm.
        if on_tpu:
            pipeline_pg = make_pipeline_graph(gb_cfg, gather="pallas")
            pg_out = pipeline_pg(variables, ftabs, *tab_args, wav_d,
                                 lens_d)
            np.asarray(pg_out[0][0, :1])
            wd.beat()
            t0 = time.perf_counter()
            for _ in range(n_g):
                pg_out = pipeline_pg(variables, ftabs, *tab_args, wav_d,
                                     lens_d)
            np.asarray(pg_out[0][0, :1])
            pg_dt = (time.perf_counter() - t0) / n_g
            graph_cols["graph_rtf_pallas_gather_x"] = round(
                audio_seconds / pg_dt, 2)
            graph_cols["graph_pallas_gather_agree"] = round(float(
                np.mean(np.asarray(pg_out[0]) == np.asarray(g_out[0]))), 4)

        # Host C++ WFST first pass over the SAME posteriors (the accurate
        # arm's cost when it stays on the host — reference architecture).
        @jax.jit
        def am_only(variables, ftabs, wav, wav_lens):
            feats, flens = fz._featurize(wav, wav_lens, tables=ftabs)
            return model.apply(variables, feats, flens, train=False)

        logp, out_lens = am_only(variables, ftabs, wav_d, lens_d)
        lp_np = np.asarray(logp, np.float32)
        ol_np = np.asarray(out_lens, np.int32)
        t0 = time.perf_counter()
        wfst_ctc_decode(lg, lp_np, ol_np, beam=12.0, max_active=500)
        wd.beat()
        graph_cols["host_fst_rtf_x"] = round(
            audio_seconds / (time.perf_counter() - t0), 2)
        graph_cols["host_threads"] = os.cpu_count()
    except Exception as e:                      # never cost the headline
        graph_cols["graph_arm_error"] = f"{type(e).__name__}: {e}"[:200]

    record = {
        "metric": "decode_rtf_x",
        "value": round(rtf_x, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf_x / 50.0, 3),
        "mfu": round(rl.get("mfu", 0.0), 4),
        "achieved_tflops": round(rl.get("achieved_tflops", 0.0), 2),
        "hbm_frac": round(rl.get("hbm_frac", 0.0), 4),
        "bound": rl.get("bound"),
        # "tpu" normally; "cpu" only when the TPU probe failed (wedged axon
        # tunnel) and the run fell back — a labeled, bounded-time degradation
        # instead of an unbounded hang under the driver.
        "backend": jax.default_backend(),
        # Serving precision of the GRU stack: int8 (default on TPU; WER
        # delta -0.06% +/- 0.09% vs f32, WERDELTA_r03.json) or fp32/bf16
        # via --fp32. int8 does not lower on the CPU fallback path.
        "quant": ("int8" if int8 and on_tpu else "none"),
        # Graph-constrained decode at serving scale (same B): the device
        # graph beam (XLA search; the WER-winning arm per WERDELTA) and
        # the host C++ WFST first pass on this machine's cores. WERs for
        # these arms live in WERDELTA (trained AM); speeds live here.
        **graph_cols,
    }
    if record["backend"] != "tpu" and not want_cpu:
        record["note"] = (f"TPU probe failed (wedged axon tunnel); single-"
                          f"core CPU fallback at B={B} — not a chip "
                          "measurement. Last chip headline: BENCH_r02.json.")
    print(json.dumps(record))
    return 0


def _main_with_body_retry() -> int:
    """Run main(); on a crash of the TPU body (e.g. FAILED_PRECONDITION
    from a tunnel that wedged *after* the probe passed), re-exec once in a
    fresh subprocess — backend init state is process-level, so a clean
    process is the only real retry. Guarded by an env flag to bound the
    recursion at one retry."""
    try:
        return main()
    except Exception:
        if os.environ.get("TPUASR_BENCH_REEXEC") == "1":
            raise
        import subprocess
        import traceback
        traceback.print_exc(file=sys.stderr)
        print("bench.py: body crashed; retrying once in a fresh process",
              file=sys.stderr)
        env = dict(os.environ, TPUASR_BENCH_REEXEC="1")
        proc = subprocess.run([sys.executable, __file__, *sys.argv[1:]],
                              env=env, timeout=1800)
        return proc.returncode


if __name__ == "__main__":
    sys.exit(_main_with_body_retry())
