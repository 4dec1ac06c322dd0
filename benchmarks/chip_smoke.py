#!/usr/bin/env python
"""On-chip Pallas kernel smoke: compile and parity-check EVERY kernel
(forward and backward) on the real TPU at small-but-realistic shapes.

Why this exists: interpret mode executes kernel semantics without Mosaic
lowering, so a kernel can pass its whole CPU test suite and still fail to
compile on hardware (it happened: gru_scan_xfused used dynamic_slice on a
value — unimplemented in Mosaic — and shipped broken). Run this after any
kernel change:

    python benchmarks/chip_smoke.py        # on the TPU host

Prints one PASS/FAIL line per kernel; exit code 0 iff all pass.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from tpuasr.utils.tpu_probe import probe_tpu_status

    status = probe_tpu_status()
    if status == "wedged":
        # Fail FAST: a wedged axon tunnel otherwise hangs backend init
        # itself indefinitely (round-3 outage, WORKLOG 46).
        print("FAIL: TPU probe timed out — tunnel down/wedged "
              "(this script checks Mosaic lowering on real hardware)")
        return 2
    if status == "no_tpu":
        print("SKIP: no TPU backend (this script checks Mosaic lowering)")
        return 0

    from tpuasr.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (this script checks Mosaic lowering)")
        return 0

    rng = np.random.default_rng(0)
    failures = []

    import time as _time

    def _queued_ms():
        """Sustained ms/call of 50 queued small matmuls (drained)."""
        mm = jax.jit(lambda a: a @ a)
        x2 = jnp.ones((512, 512))
        np.asarray(mm(x2))[0, 0]
        t0 = _time.perf_counter()
        for _ in range(50):
            out = mm(x2)
        np.asarray(out)[0, 0]
        return (_time.perf_counter() - t0) / 50 * 1e3

    dispatch_ms0 = _queued_ms()

    def check(name, fn, tol=None):
        try:
            dev = float(fn())
        except Exception as e:  # noqa: BLE001 — report, keep smoking
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            return
        limit = 1e-4 if tol is None else tol
        if not np.isfinite(dev) or dev > limit:
            failures.append(name)
            print(f"FAIL {name}: deviation {dev:.3e} > {limit:.0e}")
        else:
            print(f"PASS {name}: max dev {dev:.3e}")

    # ---- featurizer ----
    from tpuasr.features import FeatureConfig, Featurizer
    from tpuasr.features.pallas_fused import FusedFeaturizer
    fc = FeatureConfig(sample_rate=8000, n_mels=64)
    wav = jnp.asarray(rng.standard_normal((8, 16000)).astype(np.float32))
    wl = jnp.full((8,), 16000, jnp.int32)

    def feat_dev():
        a, _ = Featurizer(fc)(wav, wl)
        b, _ = FusedFeaturizer(fc)(wav, wl)
        return jnp.max(jnp.abs(a - b))
    check("fused_featurizer", feat_dev)

    # ---- CTC loss (value + grad) ----
    from tpuasr.losses import get_ctc_loss
    B, T, C, U = 4, 32, 16, 6
    logits = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    logp = jax.nn.log_softmax(logits, -1)
    labels = jnp.asarray(rng.integers(1, C, size=(B, U)), jnp.int32)
    ilen = jnp.full((B,), T, jnp.int32)
    llen = jnp.full((B,), U, jnp.int32)
    ref_ctc, pal_ctc = get_ctc_loss("fb"), get_ctc_loss("pallas")

    def ctc_dev():
        a = jnp.sum(ref_ctc(logp, labels, ilen, llen))
        b = jnp.sum(pal_ctc(logp, labels, ilen, llen))
        ga = jax.grad(lambda x: jnp.sum(
            ref_ctc(jax.nn.log_softmax(x, -1), labels, ilen, llen)))(logits)
        gb = jax.grad(lambda x: jnp.sum(
            pal_ctc(jax.nn.log_softmax(x, -1), labels, ilen, llen)))(logits)
        return jnp.maximum(jnp.abs(a - b), jnp.max(jnp.abs(ga - gb)))
    check("ctc_pallas fwd+bwd", ctc_dev)

    # ---- GRU kernels vs XLA scan (value + grad) ----
    from tpuasr.models.layers import GRULayer
    Bg, Tg, Dg, Hg = 16, 48, 128, 128
    x = jnp.asarray(rng.standard_normal((Bg, Tg, Dg)).astype(np.float32))
    lens = jnp.asarray(rng.integers(Tg // 2, Tg + 1, size=(Bg,)), jnp.int32)

    def gru_pair(use_pallas, fused_proj=False):
        layer = GRULayer(Hg, use_pallas=use_pallas, fused_proj=fused_proj)
        vs = layer.init(jax.random.PRNGKey(0), x, lens)

        def loss(v, xx):
            return jnp.sum(layer.apply(v, xx, lens) ** 2)
        return vs, loss

    vs_ref, loss_ref = gru_pair(False)

    def gru_dev(fused_proj):
        _, loss_pal = gru_pair(True, fused_proj)
        a, ga = jax.value_and_grad(loss_ref, argnums=1)(vs_ref, x)
        b, gb = jax.value_and_grad(loss_pal, argnums=1)(vs_ref, x)
        return jnp.maximum(jnp.abs(a - b) / jnp.maximum(jnp.abs(a), 1.0),
                           jnp.max(jnp.abs(ga - gb)))
    check("gru_scan fwd+bwd", lambda: gru_dev(False), tol=3e-3)
    check("gru_scan_xfused fwd+bwd", lambda: gru_dev(True), tol=3e-3)

    def gru_q8_dev():
        # Grid-exact inputs (absmax exactly 127, integer entries): the
        # dynamic quantizer is lossless, so the int8 kernel must match the
        # f32 fused kernel to rounding — a Mosaic int8-matmul lowering
        # gate, not a quantization-tolerance check.
        from tpuasr.ops.pallas_gru import (gru_scan_xfused,
                                           gru_scan_xfused_q8)
        from tpuasr.ops.quant import quantize_per_channel
        rq = np.random.default_rng(77)       # own stream (worklog item 43)
        T8, B8, D8, H8 = 32, 16, 128, 128
        xg = rq.integers(-127, 128, size=(T8, B8, D8)).astype(np.float32)
        xg[:, :, 0] = 127.0
        wxg = rq.integers(-8, 9, size=(D8, 3 * H8)).astype(np.float32)
        wxg[0, :] = 127.0
        bg = rq.standard_normal(3 * H8).astype(np.float32)
        whg = (rq.standard_normal((H8, 3 * H8)) * 0.05).astype(np.float32)
        lens8 = rq.integers(T8 // 2, T8 + 1, size=B8)
        mk = jnp.asarray((np.arange(T8)[:, None] < lens8[None, :])
                         [:, :, None].astype(np.float32))
        wq, sw = quantize_per_channel(jnp.asarray(wxg))
        ys_q = gru_scan_xfused_q8(jnp.asarray(xg), wq, sw, jnp.asarray(bg),
                                  jnp.asarray(whg), mk)
        ys_f = gru_scan_xfused(jnp.asarray(xg), jnp.asarray(wxg),
                               jnp.asarray(bg), jnp.asarray(whg), mk)
        dev = jnp.max(jnp.abs(ys_q - ys_f))
        # int8 recurrence: compiled kernel vs the pure-jnp reference of the
        # SAME quantized math (fp-rounding-level agreement required).
        from tpuasr.ops.quant import reference_q8_gru_scan
        whq, swh = quantize_per_channel(jnp.asarray(whg))
        ys_kr = gru_scan_xfused_q8(jnp.asarray(xg), wq, sw, jnp.asarray(bg),
                                   whq, mk, wh_scale=swh)
        ys_rr = reference_q8_gru_scan(jnp.asarray(xg), wq, sw,
                                      jnp.asarray(bg), whq, mk,
                                      wh_scale=swh)
        return jnp.maximum(dev, jnp.max(jnp.abs(ys_kr - ys_rr)))
    check("gru_scan_xfused_q8 (int8 proj + rec, exact grid)", gru_q8_dev,
          tol=1e-4)

    def conv_q8_dev():
        # Same two-part gate as the q8 GRU: grid-exact inputs against an
        # exact integer gold (Mosaic int8-matmul + framing lowering), and
        # the compiled kernel against the pure-jnp quantized reference.
        from tpuasr.ops.pallas_conv import (conv_taps_q8,
                                            reference_q8_conv_taps)
        from tpuasr.ops.quant import quantize_per_channel
        rq = np.random.default_rng(91)
        B8, T8, K8, N8, Kt8 = 2, 150, 128, 256, 11
        xg = rq.integers(-127, 128,
                         size=(B8, T8 + Kt8 - 1, K8)).astype(np.float32)
        xg[:, :, 0] = 127.0
        qg = rq.integers(-127, 128, size=(Kt8, K8, N8)).astype(np.float32)
        qg[:, 0, :] = 127.0
        sc = rq.uniform(0.5, 2.0, size=(N8,)).astype(np.float32) / 127.0
        m = jnp.asarray(qg * sc[None, None, :])
        mq, sw = quantize_per_channel(m.reshape(-1, N8))
        mq = mq.reshape(Kt8, K8, N8)
        out = conv_taps_q8(jnp.asarray(xg), mq, sw, T8)
        gold = np.zeros((B8, T8, N8), np.float64)
        for t in range(Kt8):
            gold += xg[:, t:t + T8].astype(np.float64) @ qg[t].astype(
                np.float64)
        gold *= np.asarray(sw, np.float64)[None, None, :]
        dev_grid = float(np.max(np.abs(np.asarray(out, np.float64) - gold)
                                / np.maximum(np.abs(gold), 1.0)))
        xr = jnp.asarray(rq.standard_normal(
            (B8, T8 + Kt8 - 1, K8)).astype(np.float32))
        a = conv_taps_q8(xr, mq, sw, T8)
        b = reference_q8_conv_taps(xr, mq, sw, T8)
        dev_ref = float(jnp.max(jnp.abs(a - b)))
        return max(dev_grid, dev_ref)
    check("conv_taps_q8 (int8 tap-GEMM conv, exact grid)", conv_q8_dev,
          tol=1e-4)

    from tpuasr.models.layers import BiGRU

    def bidir_dev():
        plain = BiGRU(Hg)
        vs = plain.init(jax.random.PRNGKey(1), x, lens)
        fused = BiGRU(Hg, fused_bidir=True)
        # Map plain fwd/bwd GRULayer params onto the fused layout.
        p = vs["params"]
        vf = {"params": {
            "fwd_wx": p["fwd"]["wx"], "fwd_wh": p["fwd"]["wh"],
            "fwd_b": p["fwd"]["b"], "bwd_wx": p["bwd"]["wx"],
            "bwd_wh": p["bwd"]["wh"], "bwd_b": p["bwd"]["b"]}}

        def la(v, xx):
            return jnp.sum(plain.apply(v, xx, lens) ** 2)

        def lb(v, xx):
            return jnp.sum(fused.apply(v, xx, lens) ** 2)
        a, ga = jax.value_and_grad(la, argnums=1)(vs, x)
        b, gb = jax.value_and_grad(lb, argnums=1)(vf, x)
        return jnp.maximum(jnp.abs(a - b) / jnp.maximum(jnp.abs(a), 1.0),
                           jnp.max(jnp.abs(ga - gb)))
    check("gru_scan_bidir fwd+bwd", bidir_dev, tol=3e-3)

    # ---- fused dynamic routing (value + grad) ----
    from tpuasr.models.capsnet import dynamic_routing
    from tpuasr.ops.pallas_routing import routed_caps
    Ir, Dr, Or, Ddr = 256, 8, 48, 16
    rng_r = np.random.default_rng(123)   # own stream: keep later checks'
    ur = jnp.asarray(                    # random inputs reproducible
        rng_r.standard_normal((2, 4, Ir, Dr)).astype(np.float32)) * 0.5
    Wr = jnp.asarray(rng_r.standard_normal(
        (Ir, Dr, Or * Ddr)).astype(np.float32)) * 0.2
    tgt = jnp.asarray(
        rng_r.standard_normal((2, 4, Or, Ddr)).astype(np.float32))

    def route_ref(u, W):
        uh = jnp.einsum("btid,idk->btik", u, W,
                        preferred_element_type=jnp.float32)
        return dynamic_routing(
            uh.reshape(u.shape[0], u.shape[1], Ir, Or, Ddr), 3)

    def routing_dev():
        a = route_ref(ur, Wr)
        b = routed_caps(ur, Wr, Or, Ddr)
        ga = jax.grad(lambda u, W: jnp.sum((route_ref(u, W) - tgt) ** 2),
                      argnums=(0, 1))(ur, Wr)
        gb = jax.grad(lambda u, W: jnp.sum(
            (routed_caps(u, W, Or, Ddr) - tgt) ** 2),
            argnums=(0, 1))(ur, Wr)
        dev = jnp.max(jnp.abs(a - b))
        for x, y in zip(ga, gb):
            dev = jnp.maximum(dev, jnp.max(
                jnp.abs(x - y) / jnp.maximum(jnp.abs(x), 1.0)))
        return dev
    check("pallas_routing fwd+bwd", routing_dev, tol=3e-3)

    # ---- beam search kernel (plain + LM-fused) ----
    from tpuasr.decode import BeamSearchConfig, ctc_beam_search
    from tpuasr.decode.pallas_beam import ctc_beam_search_pallas
    from tpuasr.lm import train_ngram
    Cb, Tb = 16, 24
    lp = jax.nn.log_softmax(jnp.asarray(
        rng.standard_normal((4, Tb, Cb)).astype(np.float32)) * 1.5, -1)
    blens = jnp.asarray([Tb, Tb - 3, Tb - 7, 5], jnp.int32)
    syms = ["<blk>"] + [f"u{i}" for i in range(Cb - 1)]
    lm = train_ngram([[syms[rng.integers(1, Cb)]
                       for _ in range(rng.integers(2, 8))]
                      for _ in range(60)], order=2)
    bigram = lm.fusion_matrix(syms)
    eos = lm.eos_vector(syms)

    lm3 = train_ngram([[syms[rng.integers(1, Cb)]
                        for _ in range(rng.integers(2, 8))]
                       for _ in range(60)], order=3)
    trigram = lm3.fusion_tensor3(syms)
    eos3 = lm3.eos_matrix(syms)

    def beam_dev(fusion):
        cfg = BeamSearchConfig(beam_width=8, class_topk=Cb - 1, max_len=Tb,
                               lm_weight=0.6 if fusion else 0.0)
        kw = {}
        if fusion == 2:
            kw = dict(lm_bigram=bigram, lm_eos=eos)
        elif fusion == 3:
            kw = dict(lm_trigram=trigram, lm_eos=eos3)
        a = ctc_beam_search(lp, blens, cfg, n_best=2, **kw)
        b = ctc_beam_search_pallas(lp, blens, cfg, n_best=2, **kw)
        if not np.array_equal(np.asarray(a["tokens"]),
                              np.asarray(b["tokens"])):
            return np.inf
        sa, sb = np.asarray(a["scores"]), np.asarray(b["scores"])
        return np.max(np.abs(sa - sb) / np.maximum(np.abs(sa), 1.0))
    check("pallas_beam", lambda: beam_dev(0), tol=5e-4)
    check("pallas_beam + bigram fusion", lambda: beam_dev(2), tol=5e-4)
    check("pallas_beam + trigram fusion", lambda: beam_dev(3), tol=5e-4)

    # ---- graph-constrained beam ON HARDWARE ----
    # The packed next+cost gather once shipped with an f32 carrier whose
    # denormal-range int32 state ids the TPU flushed to zero — every CPU
    # test green, every chip decode silently wrong (WERDELTA_r05). This
    # drives the graph beam on the device over one-hot posteriors that
    # spell a planted in-graph sentence: tokens must equal the plant and
    # every hypothesis must reach a final state.
    def graph_beam_dev():
        from tpuasr.decode import (GraphTables, compile_graph_tables,
                                   compose, lexicon_to_fst, ngram_to_fst)
        from tpuasr.lm import train_ngram as _tn
        prons = [("a", (1, 2)), ("b", (3,)), ("c", (2, 3, 1))]
        lg = compose(lexicon_to_fst(prons),
                     ngram_to_fst(_tn([["a", "b"], ["b", "c"],
                                       ["a", "b", "c"]], order=2),
                                  {"a": 1, "b": 2, "c": 3}))
        tabs = compile_graph_tables(lg, 5)
        plant = [1, 2, 3, 2, 3, 1]            # "a b c"
        Tg = 2 * len(plant) + 2
        lpx = np.full((2, Tg, 5), -14.0, np.float32)
        for bb in range(2):
            t = 0
            prev = None
            for tok in plant:
                if tok == prev:
                    lpx[bb, t, 0] = 0.0
                    t += 1
                lpx[bb, t, tok] = 0.0
                t += 1
                prev = tok
            while t < Tg:
                lpx[bb, t, 0] = 0.0
                t += 1
            lpx[bb] -= np.log(np.exp(lpx[bb]).sum(-1, keepdims=True))
        g_out = ctc_beam_search(
            jnp.asarray(lpx), jnp.asarray([Tg, Tg], np.int32),
            BeamSearchConfig(beam_width=4, class_topk=4, max_len=16),
            graph=GraphTables(*(jnp.asarray(x) for x in
                                (tabs.next_state, tabs.cost, tabs.final)),
                              tabs.start))
        tk = np.asarray(g_out["tokens"])
        tl = np.asarray(g_out["token_lens"])
        fin = np.asarray(g_out["reached_final"])
        ok = all(tk[bb, 0, :tl[bb, 0]].tolist() == plant and fin[bb, 0]
                 for bb in range(2))
        return 0.0 if ok else np.inf
    check("graph beam on device (tiny LG)", graph_beam_dev, tol=0.0)

    # The denormal canary proper. The f32-carrier bug was SHAPE-dependent:
    # a tiny graph (and even a 50k-row zero-padded one) decoded fine on
    # chip while the 22k-state harness graph at B=16/K=8/C=14 corrupted
    # (token_exact 0.06) — the flushing gather lowering only gets picked
    # at larger gather shapes. This chain automaton replicates the failing
    # configuration synthetically: from state s the ONLY legal class is
    # 1 + s % (C-1) -> s+1, final solely at state L, one-hot posteriors
    # spelling the forced walk; any corrupted next-state id kills the one
    # legal path. Measured: old f32 carrier FAILs this (final_frac 0.00),
    # int32 carrier PASSes.
    def graph_beam_chain_dev():
        from tpuasr.decode import GraphTables
        Sg, Cg, Lg = 22_000, 14, 20
        plant = [1 + (i % (Cg - 1)) for i in range(Lg)]
        nxt = np.full((Sg, Cg), -1, np.int32)
        cost = np.zeros((Sg, Cg), np.float32)
        s_ids = np.arange(Sg - 1)
        nxt[s_ids, 1 + (s_ids % (Cg - 1))] = s_ids + 1
        cost[s_ids, 1 + (s_ids % (Cg - 1))] = 0.01
        fing = np.full((Sg,), 1e30, np.float32)
        fing[Lg] = 0.0
        Bg, Tg2 = 16, 2 * Lg + 2
        lpx = np.full((Bg, Tg2, Cg), -14.0, np.float32)
        for bb in range(Bg):
            t = 0
            for tok in plant:
                lpx[bb, t, tok] = 0.0
                lpx[bb, t + 1, tok] = 0.0
                t += 2
            while t < Tg2:
                lpx[bb, t, 0] = 0.0
                t += 1
            lpx[bb] -= np.log(np.exp(lpx[bb]).sum(-1, keepdims=True))
        g_out = ctc_beam_search(
            jnp.asarray(lpx), jnp.asarray([Tg2] * Bg, np.int32),
            BeamSearchConfig(beam_width=8, class_topk=Cg - 1, max_len=32),
            graph=GraphTables(jnp.asarray(nxt), jnp.asarray(cost),
                              jnp.asarray(fing), 0))
        tk = np.asarray(g_out["tokens"])
        tl = np.asarray(g_out["token_lens"])
        fin2 = np.asarray(g_out["reached_final"])
        ok = all(tk[bb, 0, :tl[bb, 0]].tolist() == plant and fin2[bb, 0]
                 for bb in range(Bg))
        return 0.0 if ok else np.inf
    check("graph beam 22k-state chain (denormal canary)",
          graph_beam_chain_dev, tol=0.0)

    # ---- DMA-ring graph-row gather (tpuasr/ops/pallas_gather.py) ----
    # Interpret-mode tests can pass on a kernel Mosaic rejects; compile
    # the ring on hardware at a bench-like row width and check exactness.
    def gather_dev():
        from tpuasr.ops.pallas_gather import gather_rows
        Sg, Wg = 4096, 128
        table = jnp.asarray(
            rng.standard_normal((Sg, Wg)).astype(np.float32))
        gidx = jnp.asarray(rng.integers(0, Sg, size=(16, 8)), jnp.int32)
        got = np.asarray(jax.jit(gather_rows)(table, gidx))
        ref = np.asarray(table)[np.asarray(gidx)]
        return float(np.abs(got - ref).max())
    check("pallas_gather DMA ring", gather_dev, tol=0.0)

    # ---- dispatch health ----
    # A jit that closes over a multi-MB device constant permanently flips
    # the axon terminal into a degraded synchronous dispatch mode (~2 ms
    # per call on EVERY later executable in the process). Everything above
    # threads weights as arguments; this guard catches a regression: after
    # a real training step (Trainer + fused featurizer + Pallas CTC/GRU),
    # a trivial op must still dispatch fast.
    import time as _time

    def dispatch_health():
        from tpuasr.data import make_synthetic_corpus, AudioLoader, LoaderConfig
        import tempfile
        from tpuasr.train import TrainConfig, Trainer
        with tempfile.TemporaryDirectory() as td:
            corpus = make_synthetic_corpus(td, num_utts=4, vocab_size=5)
            loader = AudioLoader(corpus.manifest,
                                 LoaderConfig(batch_size=4, max_label_len=8))
            cfg = TrainConfig(model="deepspeech_ctc", num_classes=5,
                              warmup_steps=1, fused_featurizer=True,
                              ctc_impl="pallas",
                              model_kwargs=dict(rnn_hidden=128, rnn_layers=1,
                                                conv_channels=4,
                                                pallas_gru=True))
            trainer = Trainer(cfg, FeatureConfig(n_mels=32))
            batch = loader.make_batch(loader.batch_plan(0)[0])
            state = trainer.init_state(batch)
            state, m = trainer.train_step(state, trainer._device_batch(batch),
                                          trainer.feat_tables)
            np.asarray(m["loss"])
        # Self-relative queued-throughput probe: ambient tunnel latency
        # varies between sessions, so compare against the SAME process's
        # start-of-run baseline. A captured-constant regression multiplies
        # sustained dispatch ~50-100x; allow generous ambient drift.
        ms = _queued_ms()
        print(f"  queued dispatch: start {dispatch_ms0:.3f} -> "
              f"after train_step {ms:.3f} ms/call")
        return 0.0 if ms < max(5.0 * dispatch_ms0, 1.0) else np.inf
    check("dispatch health (no captured-constant poisoning)",
          dispatch_health)

    print(("ALL PASS" if not failures else
           f"{len(failures)} FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
