"""Chunked, stateful streaming recognizer for the unidirectional DeepSpeech
variant (DeepSpeechCTC(bidirectional=False, explicit_pad=True)).

Design for exactness (streaming output == offline forward on the full
audio, verified in tests/test_streaming.py):

  * featurizer: snip-edges framing is causal given (win - hop) sample
    lookahead — leftover samples carry across chunks; CMVN must be off
    (per-utterance statistics are anti-causal by definition);
  * conv frontend: the model variant uses explicit symmetric time padding
    (5, 5) (XLA SAME's split depends on total-length parity — anti-causal
    for stride 2). The stream prepends the 5 zero context frames once,
    carries a rolling input buffer per conv layer, emits an output as soon
    as its full receptive field is buffered, and flush() appends the right
    zero padding;
  * BatchNorm (eval): running stats, purely elementwise — stream-safe;
  * GRU layers: unidirectional scan with the hidden state carried across
    chunks — exact by construction;
  * greedy CTC collapse with the previous emission carried across chunks.

Latency: 5 conv1 input frames (50 ms) + 5 conv2 frames (100 ms) lookahead
plus the chunk size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.features import FeatureConfig
from tpuasr.features import functional as F


class StreamingRecognizer:
    """Feed 1-D float32 sample chunks; receive incremental token ids.

    Single-utterance, batch-1 (serving fan-out batches across instances).
    """

    def __init__(self, variables, feat_cfg: FeatureConfig, blank: int = 0,
                 decode: str = "greedy", beam_cfg=None, lm_bigram=None,
                 lm_eos=None, keep_logp: bool = False, graph=None):
        """decode: "greedy" (incremental emissions via feed()) or "beam"
        (resumable prefix beam search across chunks; read hypothesis() /
        flush() — beam hypotheses may revise earlier output, so per-chunk
        emissions would be unstable by nature).

        lm_bigram/lm_eos: shallow-fusion tables (NGramLM.fusion_matrix /
        eos_vector) applied inside the resumable beam search with
        beam_cfg.lm_weight; beam mode only.

        graph: optional GraphTables (tpuasr/decode/graph.py) — the
        decoding graph constrains the streaming beam search itself, and
        each beam's graph state is part of the resumable carry, so the
        constraint survives chunk boundaries (the streaming latgen
        analog); beam mode only. Weighted by beam_cfg.graph_weight.

        keep_logp: retain per-chunk AM log-probs in ``logp_history`` so the
        caller can CTC-forced-align the final hypothesis for timestamps
        (tpuasr.losses.ctc_align); costs O(T*C) host memory."""
        c = feat_cfg
        if c.cmn or c.cvn:
            raise ValueError("streaming requires cmn=False, cvn=False "
                             "(per-utterance CMVN is anti-causal)")
        if c.center or c.frame_style != "kaldi":
            raise ValueError("streaming requires kaldi framing, center=False")
        self.cfg = c
        self.blank = blank
        self.decode = decode
        if decode == "beam":
            from tpuasr.decode.prefix_beam import BeamSearchConfig
            self.beam_cfg = beam_cfg or BeamSearchConfig(
                beam_width=8, class_topk=8, blank=blank)
        elif decode != "greedy":
            raise ValueError(f"unknown decode mode {decode!r}")
        self.lm_bigram = (None if lm_bigram is None
                          else jnp.asarray(lm_bigram, jnp.float32))
        self.lm_eos = (None if lm_eos is None
                       else jnp.asarray(lm_eos, jnp.float32))
        self.graph = None
        if graph is not None:
            if decode != "beam":
                raise ValueError("graph decoding requires decode='beam'")
            from tpuasr.decode.graph import GraphTables
            # device_put ONCE (numpy args re-upload per call on axon).
            self.graph = GraphTables(jnp.asarray(graph.next_state),
                                     jnp.asarray(graph.cost, jnp.float32),
                                     jnp.asarray(graph.final, jnp.float32),
                                     graph.start)
        self.keep_logp = keep_logp
        p = variables["params"]
        self.p = p
        bs = variables.get("batch_stats", {})
        self.bs = bs
        self.n_layers = len([k for k in p if k.startswith("rnn")
                             and not k.endswith("_bn")])

        # Featurizer constants.
        self._window = jnp.asarray(
            F.window_vector(c.window, c.win_length, c.periodic_window))
        cos_m, sin_m = F.rdft_matrices(c.fft_size, c.win_length)
        self._cos = jnp.asarray(cos_m)
        self._sin = jnp.asarray(sin_m)
        self._mel = jnp.asarray(F.mel_filterbank(
            c.fft_size, c.n_mels, c.sample_rate, c.fmin, c.fmax, c.htk_mel))

        self.reset()

        # Params/tables are threaded through the jitted functions as
        # ARGUMENTS: a jit that closes over multi-MB device constants
        # permanently degrades dispatch on the axon TPU terminal
        # (~2 ms/call on every subsequent executable in the process).
        # device_put ONCE: checkpoints restore as numpy, and numpy args
        # re-upload through the tunnel on EVERY call (~600 ms/tick).
        self._pw = jax.device_put({"p": p, "bs": bs})
        self._ftabs = {"window": self._window, "cos": self._cos,
                       "sin": self._sin, "mel": self._mel}
        self._feat_chunk = jax.jit(self._featurize_frames)
        self._conv1_apply = jax.jit(self._conv1)
        self._conv2_apply = jax.jit(self._conv2)
        self._rnn_apply = jax.jit(self._rnn_head)

    # ---- state ----

    def reset(self):
        c = self.cfg
        self._samples = np.zeros((0,), np.float32)
        # Conv input buffers start with their left zero-context (5 frames).
        self._buf1 = np.zeros((5, c.n_mels), np.float32)
        self._buf2 = None          # lazily sized to conv1 output dim
        self._h = None             # per-layer GRU states
        self._prev_tok = self.blank
        self._beam_state = None
        self._fstate = None        # device pytree for the fused chunk path
        self._fused_ok = True
        self.tokens: list[int] = []
        # Greedy mode: model-output frame index at which each token in
        # ``tokens`` was first emitted (timestamps; stream.py --timestamps).
        self.token_frames: list[int] = []
        self._out_frames = 0
        self.logp_history: list[np.ndarray] = []

    @property
    def frame_seconds(self) -> float:
        """Seconds of audio per model-output frame (conv time stride 2)."""
        return 2.0 * self.cfg.hop_length / self.cfg.sample_rate

    # ---- pure compute pieces (jitted) ----

    def _featurize_frames(self, tabs, frames):
        """(T, win) -> (T, n_mels) log-mel (no CMVN)."""
        c = self.cfg
        w = frames * tabs["window"]
        re = w @ tabs["cos"]
        im = w @ tabs["sin"]
        power = re * re + im * im
        mel = power @ tabs["mel"]
        return jnp.log(jnp.maximum(mel, c.log_floor))

    @staticmethod
    def _bn(pw, x, scope):
        sc = pw["p"][scope]["scale"]
        bi = pw["p"][scope]["bias"]
        mu = pw["bs"][scope]["mean"]
        var = pw["bs"][scope]["var"]
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * sc + bi

    def _conv1(self, pw, window):
        """window (Tw, F) covering full receptive fields -> (Tout, F', C)."""
        k = pw["p"]["conv1"]["kernel"]                     # (11, 41, 1, C)
        x = window[None, :, :, None]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=[(0, 0), (20, 20)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = self._bn(pw, y, "conv1_bn")
        return jax.nn.relu(y)[0]                           # (Tout, F', C)

    def _conv2(self, pw, window):
        """window (Tw, F', C) -> (Tout, F'', C)."""
        k = pw["p"]["conv2"]["kernel"]
        x = window[None]
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 2), padding=[(0, 0), (10, 10)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = self._bn(pw, y, "conv2_bn")
        return jax.nn.relu(y)[0]

    def _rnn_head(self, pw, frames, hs):
        """frames (T, D) conv output (flattened), hs: tuple of (H,) states.
        Returns (logp (T, C), new_hs)."""
        x = frames
        new_hs = []
        for i in range(self.n_layers):
            x = self._bn(pw, x, f"rnn{i}_bn")
            prm = pw["p"][f"rnn{i}"]
            wx, wh, b = prm["wx"], prm["wh"], prm["b"]
            H = wh.shape[0]
            xp = x @ wx + b

            def step(h, xp_t):
                hp = h @ wh
                r = jax.nn.sigmoid(xp_t[:H] + hp[:H])
                z = jax.nn.sigmoid(xp_t[H:2 * H] + hp[H:2 * H])
                n = jnp.tanh(xp_t[2 * H:] + r * hp[2 * H:])
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h_fin, ys = jax.lax.scan(step, hs[i], xp)
            new_hs.append(h_fin)
            x = ys
        x = self._bn(pw, x, "head_bn")
        logits = (x @ pw["p"]["head"]["kernel"]
                  + pw["p"]["head"]["bias"])
        return jax.nn.log_softmax(logits, -1), tuple(new_hs)

    # ---- fused single-program chunk (greedy) ----

    @partial(jax.jit, static_argnums=0)
    def _fused_solo_step(self, pw, ftabs, frames, buf1, buf2, h):
        """One whole greedy chunk as ONE program (featurize -> convs ->
        RNN -> argmax), all inter-stage buffers device-resident; the
        driver syncs once per chunk for the emitted ids. Mirrors the
        batched fused tick (see BatchedStreamingRecognizer)."""
        feats = self._featurize_frames(ftabs, frames)
        b1 = jnp.concatenate([buf1, feats], axis=0)
        n1 = max(0, (b1.shape[0] - 11) // 2 + 1)
        if n1 > 0:
            y1 = self._conv1(pw, b1)
            b1 = b1[n1 * 2:]
            b2 = jnp.concatenate([buf2, y1], axis=0)
        else:
            b2 = buf2
        n2 = max(0, b2.shape[0] - 11 + 1)
        if n2 == 0:
            return b1, b2, h, jnp.zeros((0,), jnp.int32)
        y2 = self._conv2(pw, b2)
        b2 = b2[n2:]
        fr = y2.reshape(n2, -1)
        logp, new_h = self._rnn_head(pw, fr, h)
        return b1, b2, new_h, jnp.argmax(logp, -1)

    def _solo_fused_feed(self, samples) -> list:
        c = self.cfg
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)])
        n = len(self._samples)
        T = max(0, 1 + (n - c.win_length) // c.hop_length)
        if T == 0:
            return []
        if self._fstate is None:
            F2 = jax.eval_shape(
                lambda w: self._conv1(self._pw, w),
                jax.ShapeDtypeStruct((11, c.n_mels), jnp.float32)).shape
            hs = tuple(jnp.zeros((self.p[f"rnn{i}"]["wh"].shape[0],),
                                 jnp.float32)
                       for i in range(self.n_layers))
            self._fstate = dict(buf1=jnp.asarray(self._buf1),
                                buf2=jnp.zeros((5,) + F2[1:], jnp.float32),
                                h=hs)
        idx = (np.arange(T)[:, None] * c.hop_length
               + np.arange(c.win_length)[None, :])
        frames = self._samples[idx]
        self._samples = self._samples[T * c.hop_length:]
        st = self._fstate
        b1, b2, h, ids = self._fused_solo_step(
            self._pw, self._ftabs, jnp.asarray(frames),
            st["buf1"], st["buf2"], st["h"])
        self._fstate = dict(buf1=b1, buf2=b2, h=h)
        emitted = []
        for t in np.asarray(ids):                  # the chunk's ONE sync
            t = int(t)
            if t != self.blank and t != self._prev_tok:
                emitted.append(t)
                self.token_frames.append(self._out_frames)
            self._prev_tok = t
            self._out_frames += 1
        self.tokens.extend(emitted)
        return emitted

    def _solo_defuse(self):
        if self._fstate is not None:
            st = self._fstate
            self._buf1 = np.asarray(st["buf1"])
            self._buf2 = np.asarray(st["buf2"])
            self._h = st["h"]
            self._fstate = None
        self._fused_ok = False

    # ---- streaming driver ----

    def feed(self, samples) -> list:
        """Consume a chunk of samples; returns newly-emitted token ids."""
        if self.decode == "greedy" and not self.keep_logp and self._fused_ok:
            return self._solo_fused_feed(samples)
        self._solo_defuse()
        c = self.cfg
        self._samples = np.concatenate(
            [self._samples, np.asarray(samples, np.float32)])
        n = len(self._samples)
        T = max(0, 1 + (n - c.win_length) // c.hop_length)
        if T > 0:
            idx = (np.arange(T)[:, None] * c.hop_length
                   + np.arange(c.win_length)[None, :])
            feats = np.asarray(self._feat_chunk(
                self._ftabs, jnp.asarray(self._samples[idx])))
            self._samples = self._samples[T * c.hop_length:]
            self._buf1 = np.concatenate([self._buf1, feats], axis=0)
        return self._advance(final=False)

    def flush(self) -> list:
        """Signal end of stream; pads tails and returns remaining tokens."""
        self._solo_defuse()
        c = self.cfg
        # Remaining samples shorter than a window are dropped (snip-edges),
        # matching the offline featurizer.
        self._buf1 = np.concatenate(
            [self._buf1, np.zeros((5, c.n_mels), np.float32)], axis=0)
        out = self._advance(final=True)
        return out

    def _advance(self, final: bool) -> list:
        # conv1: emit out frames whose 11-frame input window is buffered.
        emitted = []
        n1 = len(self._buf1)
        n_out1 = max(0, (n1 - 11) // 2 + 1)
        if n_out1 > 0:
            y1 = np.asarray(self._conv1_apply(self._pw,
                                  jnp.asarray(self._buf1)))
            y1 = y1[:n_out1]
            self._buf1 = self._buf1[n_out1 * 2:]
            if self._buf2 is None:
                self._buf2 = np.zeros((5,) + y1.shape[1:], np.float32)
            self._buf2 = np.concatenate([self._buf2, y1], axis=0)
        if final and self._buf2 is not None:
            self._buf2 = np.concatenate(
                [self._buf2, np.zeros((5,) + self._buf2.shape[1:],
                                      np.float32)], axis=0)
        if self._buf2 is None:
            return []
        n2 = len(self._buf2)
        n_out2 = max(0, n2 - 11 + 1)
        if n_out2 <= 0:
            return []
        y2 = np.asarray(self._conv2_apply(self._pw,
                                  jnp.asarray(self._buf2)))
        y2 = y2[:n_out2]
        self._buf2 = self._buf2[n_out2:]
        frames = y2.reshape(n_out2, -1)
        if self._h is None:
            hs = []
            for i in range(self.n_layers):
                H = self.p[f"rnn{i}"]["wh"].shape[0]
                hs.append(jnp.zeros((H,), jnp.float32))
            self._h = tuple(hs)
        logp, self._h = self._rnn_apply(self._pw,
                                jnp.asarray(frames), self._h)
        if self.keep_logp:
            self.logp_history.append(np.asarray(logp))
        if self.decode == "beam":
            from tpuasr.decode.prefix_beam import (beam_init_state,
                                                   ctc_beam_search)
            if self._beam_state is None:
                self._beam_state = beam_init_state(1, self.beam_cfg)
            Tc = logp.shape[0]
            out = ctc_beam_search(
                logp[None], jnp.asarray([Tc], jnp.int32), self.beam_cfg,
                init_state=self._beam_state, return_state=True,
                lm_bigram=self.lm_bigram, lm_eos=self.lm_eos,
                graph=self.graph)
            self._beam_state = out["state"]
            n = int(out["token_lens"][0, 0])
            self.tokens = np.asarray(out["tokens"])[0, 0, :n].tolist()
            return list(self.tokens)
        ids = np.asarray(jnp.argmax(logp, -1))
        for t in ids:
            t = int(t)
            if t != self.blank and t != self._prev_tok:
                emitted.append(t)
                self.token_frames.append(self._out_frames)
            self._prev_tok = t
            self._out_frames += 1
        self.tokens.extend(emitted)
        return emitted


class BatchedStreamingRecognizer:
    """N concurrent streams advanced in lockstep (synchronous chunk ticks) —
    the TPU serving shape: one jitted program per tick processes the whole
    slot batch, so chip utilization scales with concurrent sessions.

    Per-slot semantics are identical to StreamingRecognizer (greedy OR
    resumable prefix beam search with optional LM shallow fusion); tests
    verify each slot matches a solo recognizer bit-for-bit in both modes.
    Slots are attached/detached independently; detached slots ride along
    masked (the beam search freezes rows whose length is 0).
    """

    def __init__(self, variables, feat_cfg: FeatureConfig, n_streams: int,
                 blank: int = 0, decode: str = "greedy", beam_cfg=None,
                 lm_bigram=None, lm_eos=None, graph=None):
        self.n = n_streams
        # Reuse the single-stream compute; vmap it over the slot axis.
        self._solo = StreamingRecognizer(variables, feat_cfg, blank,
                                         decode=decode, beam_cfg=beam_cfg,
                                         lm_bigram=lm_bigram, lm_eos=lm_eos,
                                         graph=graph)
        self.blank = blank
        self.cfg = feat_cfg
        self.decode = decode
        if decode == "beam":
            self.beam_cfg = self._solo.beam_cfg
        self.lm_bigram = self._solo.lm_bigram
        self.lm_eos = self._solo.lm_eos
        self.graph = self._solo.graph
        self._vfeat = jax.jit(jax.vmap(self._solo._featurize_frames,
                                       in_axes=(None, 0)))
        self._vconv1 = jax.jit(jax.vmap(self._solo._conv1,
                                        in_axes=(None, 0)))
        self._vconv2 = jax.jit(jax.vmap(self._solo._conv2,
                                        in_axes=(None, 0)))
        self._vrnn = jax.jit(jax.vmap(self._solo._rnn_head,
                                      in_axes=(None, 0, 0),
                                      out_axes=(0, 0)))
        self.reset()

    def reset(self):
        c = self.cfg
        self._samples = [np.zeros((0,), np.float32) for _ in range(self.n)]
        self._buf1 = [np.zeros((5, c.n_mels), np.float32)
                      for _ in range(self.n)]
        self._buf2 = [None] * self.n
        self._h = None
        self._prev = [self.blank] * self.n
        self._beam_state = None          # (n,)-batched resumable beam state
        self.tokens = [[] for _ in range(self.n)]
        self.active = [False] * self.n
        self._fused_ok = True            # regular lockstep so far
        self._fstate = None              # device pytree for the fused tick

    def attach(self, slot: int):
        """(Re)start a stream in a slot."""
        if self._fstate is not None:     # mid-stream (re)attach: irregular
            self._defuse()
        c = self.cfg
        self._samples[slot] = np.zeros((0,), np.float32)
        self._buf1[slot] = np.zeros((5, c.n_mels), np.float32)
        self._buf2[slot] = None
        self._prev[slot] = self.blank
        self.tokens[slot] = []
        self.active[slot] = True
        if self._h is not None:
            # Layer states are (n_slots, H): zero the slot's ROW.
            self._h = tuple(h.at[slot].set(0.0) for h in self._h)
        if self._beam_state is not None:
            from tpuasr.decode.prefix_beam import beam_init_state
            fresh = beam_init_state(1, self.beam_cfg)
            if self.graph is not None and "gs" in self._beam_state:
                K = self.beam_cfg.beam_width
                fresh = dict(fresh,
                             gs=jnp.full((1, K), self.graph.start,
                                         jnp.int32),
                             gc=jnp.zeros((1, K), jnp.float32))
            self._beam_state = jax.tree_util.tree_map(
                lambda full, f1: full.at[slot].set(f1[0]),
                self._beam_state, fresh)

    def feed(self, chunks: dict) -> dict:
        """chunks: {slot: samples}. Returns {slot: new tokens}.

        Lockstep semantics: each processing tick advances all ACTIVE slots
        by the minimum available frame count (remainders carry over), so
        feed every active slot each tick — an unfed active slot stalls the
        batch until it receives audio or is flushed.

        Regular greedy ticks (every slot fed the same-size chunk, no
        mid-stream attach) take the FUSED path: the whole tick — featurize,
        both convs, the RNN stack, argmax — is ONE jitted program with all
        inter-stage buffers device-resident and a single small host sync
        for the emitted ids. The staged multi-dispatch path remains for
        ragged feeds/flushes (each extra device sync costs ~80 ms under a
        slow axon tunnel; per-slot eager device ops are even worse).
        """
        if (self._fused_ok
                and set(chunks) == set(range(self.n))
                and len({len(v) for v in chunks.values()}) == 1):
            return self._fused_feed(chunks)
        self._defuse()
        c = self.cfg
        for slot, samples in chunks.items():
            if not self.active[slot]:
                self.attach(slot)
            self._samples[slot] = np.concatenate(
                [self._samples[slot], np.asarray(samples, np.float32)])
        active = [i for i in range(self.n) if self.active[i]]
        if not active:
            return {}
        # Frames available per active slot; process the common minimum.
        counts = []
        for i in active:
            n = len(self._samples[i])
            counts.append(max(0, 1 + (n - c.win_length) // c.hop_length))
        T = min(counts)
        if T > 0:
            idx = (np.arange(T)[:, None] * c.hop_length
                   + np.arange(c.win_length)[None, :])
            frames = np.stack([self._samples[i][idx] for i in active])
            feats = np.asarray(self._vfeat(self._solo._ftabs,
                               jnp.asarray(frames)))
            for j, i in enumerate(active):
                self._samples[i] = self._samples[i][T * c.hop_length:]
                self._buf1[i] = np.concatenate([self._buf1[i], feats[j]],
                                               axis=0)
        return self._advance(active)

    # ---- fused single-program tick (regular greedy lockstep) ----

    def _fused_am(self, pw, ftabs, frames, buf1, buf2, h):
        """The AM half of a fused tick (traced inside the jitted steps):
        featurize + both convs + RNN stack. Returns the new buffers/state
        and this tick's logp, or logp=None when no output frame's
        receptive field is complete yet (static per-shape decision)."""
        solo = self._solo
        feats = jax.vmap(solo._featurize_frames,
                         in_axes=(None, 0))(ftabs, frames)
        b1 = jnp.concatenate([buf1, feats], axis=1)
        n1 = max(0, (b1.shape[1] - 11) // 2 + 1)
        if n1 > 0:
            y1 = jax.vmap(solo._conv1, in_axes=(None, 0))(pw, b1)
            b1 = b1[:, n1 * 2:]
            b2 = jnp.concatenate([buf2, y1], axis=1)
        else:
            b2 = buf2
        n2 = max(0, b2.shape[1] - 11 + 1)
        if n2 == 0:
            return b1, b2, h, None
        y2 = jax.vmap(solo._conv2, in_axes=(None, 0))(pw, b2)
        b2 = b2[:, n2:]
        fr = y2.reshape(y2.shape[0], n2, -1)
        logp, new_h = jax.vmap(solo._rnn_head, in_axes=(None, 0, 0),
                               out_axes=(0, 0))(pw, fr, h)
        return b1, b2, new_h, logp

    @partial(jax.jit, static_argnums=0)
    def _fused_step(self, pw, ftabs, frames, buf1, buf2, h):
        """One whole greedy tick as ONE program. frames (N, Tf, win);
        buf1 (N, c1, F) pending feature frames; buf2 (N, c2, F', C)
        pending conv1 outputs; h: per-layer GRU states. Returns the new
        buffers/states and the greedy ids for this tick's output frames
        (possibly 0 frames early on). Shapes are static per (Tf, c1, c2)
        combo — a handful of variants, cached by jit."""
        b1, b2, new_h, logp = self._fused_am(pw, ftabs, frames, buf1,
                                             buf2, h)
        if logp is None:
            return b1, b2, new_h, jnp.zeros((frames.shape[0], 0),
                                            jnp.int32)
        return b1, b2, new_h, jnp.argmax(logp, -1)

    @partial(jax.jit, static_argnums=0)
    def _fused_step_beam(self, pw, ftabs, lm, gtabs, frames, buf1, buf2, h,
                         bstate):
        """One whole resumable-beam tick as ONE program: AM + the
        stateful prefix beam search (with optional LM shallow fusion
        and/or graph constraint) advance together; the only host sync per
        tick is the running hypothesis. lm: {"bigram": ..., "eos": ...}
        (entries optional); gtabs: None or (next_state, cost, final)
        graph tables as jit ARGUMENTS (never captured constants)."""
        from tpuasr.decode.prefix_beam import ctc_beam_search
        b1, b2, new_h, logp = self._fused_am(pw, ftabs, frames, buf1,
                                             buf2, h)
        if logp is None:
            N = frames.shape[0]
            return (b1, b2, new_h, bstate,
                    jnp.full((N, 1, 1), -1, jnp.int32),
                    jnp.zeros((N, 1), jnp.int32))
        graph = None
        if gtabs is not None:
            from tpuasr.decode.graph import GraphTables
            graph = GraphTables(*gtabs, self.graph.start)
        Tc = logp.shape[1]
        res = ctc_beam_search(
            logp, jnp.full((logp.shape[0],), Tc, jnp.int32),
            self.beam_cfg, init_state=bstate, return_state=True,
            lm_bigram=lm.get("bigram"), lm_eos=lm.get("eos"), graph=graph)
        return (b1, b2, new_h, res["state"], res["tokens"],
                res["token_lens"])

    def _fused_feed(self, chunks: dict) -> dict:
        c = self.cfg
        solo = self._solo
        for i in range(self.n):
            if not self.active[i]:
                self.attach(i)
            self._samples[i] = np.concatenate(
                [self._samples[i], np.asarray(chunks[i], np.float32)])
        if self._fstate is None:
            # Materialize the per-slot host buffers into batched device
            # state (equal lengths by the regularity precondition).
            import jax as _jax
            F2 = _jax.eval_shape(
                lambda w: solo._conv1(self._pw_shapes(), w),
                jax.ShapeDtypeStruct((11, c.n_mels), jnp.float32)).shape
            hs = tuple(jnp.zeros((self.n,
                                  solo.p[f"rnn{li}"]["wh"].shape[0]),
                                 jnp.float32)
                       for li in range(solo.n_layers))
            self._fstate = dict(
                buf1=jnp.asarray(np.stack(self._buf1)),
                buf2=jnp.zeros((self.n, 5) + F2[1:], jnp.float32),
                h=hs)
        n = len(self._samples[0])
        T = max(0, 1 + (n - c.win_length) // c.hop_length)
        out = {i: [] for i in range(self.n)}
        if T == 0:
            return out
        idx = (np.arange(T)[:, None] * c.hop_length
               + np.arange(c.win_length)[None, :])
        frames = np.stack([self._samples[i][idx] for i in range(self.n)])
        for i in range(self.n):
            self._samples[i] = self._samples[i][T * c.hop_length:]
        st = self._fstate
        if self.decode == "beam":
            from tpuasr.decode.prefix_beam import beam_init_state
            if self._beam_state is None:
                self._beam_state = beam_init_state(self.n, self.beam_cfg)
            lm = {"bigram": self.lm_bigram, "eos": self.lm_eos}
            gtabs = (None if self.graph is None else
                     (self.graph.next_state, self.graph.cost,
                      self.graph.final))
            b1, b2, h, bstate, toks, tlens = self._fused_step_beam(
                self._pw, self._ftabs_dev(), lm, gtabs,
                jnp.asarray(frames),
                st["buf1"], st["buf2"], st["h"], self._beam_state)
            self._fstate = dict(buf1=b1, buf2=b2, h=h)
            self._beam_state = bstate
            toks = np.asarray(toks)                # the tick's ONE sync
            tlens = np.asarray(tlens)
            if toks.shape[-1] > 1 or tlens.max() > 0:
                for i in range(self.n):
                    self.tokens[i] = toks[i, 0, :tlens[i, 0]].tolist()
                    out[i] = list(self.tokens[i])
            return out
        b1, b2, h, ids = self._fused_step(
            self._pw, self._ftabs_dev(), jnp.asarray(frames),
            st["buf1"], st["buf2"], st["h"])
        self._fstate = dict(buf1=b1, buf2=b2, h=h)
        ids = np.asarray(ids)                      # the tick's ONE sync
        for i in range(self.n):
            for t in ids[i]:
                t = int(t)
                if t != self.blank and t != self._prev[i]:
                    out[i].append(t)
                self._prev[i] = t
            self.tokens[i].extend(out[i])
        return out

    def _pw_shapes(self):
        return self._solo._pw

    def _ftabs_dev(self):
        return self._solo._ftabs

    @property
    def _pw(self):
        return self._solo._pw

    def _defuse(self):
        """Materialize fused device state back into the per-slot host
        buffers (one sync) and stay on the staged path from now on."""
        if self._fstate is not None:
            st = self._fstate
            b1 = np.asarray(st["buf1"])
            b2 = np.asarray(st["buf2"])
            self._buf1 = [b1[i] for i in range(self.n)]
            self._buf2 = [b2[i] for i in range(self.n)]
            self._h = tuple(h for h in st["h"])
            self._fstate = None
        self._fused_ok = False

    def _advance(self, active: list) -> dict:
        out = {i: [] for i in active}
        n_out1 = min(max(0, (len(self._buf1[i]) - 11) // 2 + 1)
                     for i in active)
        if n_out1 > 0:
            w = min(len(self._buf1[i]) for i in active)
            win1 = np.stack([self._buf1[i][:w] for i in active])
            y1 = np.asarray(self._vconv1(self._solo._pw,
                             jnp.asarray(win1)))[:, :n_out1]
            for j, i in enumerate(active):
                self._buf1[i] = self._buf1[i][n_out1 * 2:]
                if self._buf2[i] is None:
                    self._buf2[i] = np.zeros((5,) + y1.shape[2:], np.float32)
                self._buf2[i] = np.concatenate([self._buf2[i], y1[j]],
                                               axis=0)
        if any(self._buf2[i] is None for i in active):
            return out
        n_out2 = min(max(0, len(self._buf2[i]) - 11 + 1) for i in active)
        if n_out2 <= 0:
            return out
        w = min(len(self._buf2[i]) for i in active)
        win2 = np.stack([self._buf2[i][:w] for i in active])
        y2 = np.asarray(self._vconv2(self._solo._pw,
                             jnp.asarray(win2)))[:, :n_out2]
        frames = y2.reshape(len(active), n_out2, -1)
        if self._h is None:
            hs = []
            for li in range(self._solo.n_layers):
                H = self._solo.p[f"rnn{li}"]["wh"].shape[0]
                hs.append(jnp.zeros((self.n, H), jnp.float32))
            self._h = tuple(hs)
        h_act = tuple(h[jnp.asarray(active)] for h in self._h)
        logp, new_h = self._vrnn(self._solo._pw,
                         jnp.asarray(frames), h_act)
        act = jnp.asarray(active)
        self._h = tuple(hh.at[act].set(nh)
                        for hh, nh in zip(self._h, new_h))
        if self.decode == "beam":
            for i in active:
                self._buf2[i] = self._buf2[i][n_out2:]
            return self._beam_tick(active, logp)
        ids = np.asarray(jnp.argmax(logp, -1))
        for j, i in enumerate(active):
            self._buf2[i] = self._buf2[i][n_out2:]
            for t in ids[j]:
                t = int(t)
                if t != self.blank and t != self._prev[i]:
                    out[i].append(t)
                self._prev[i] = t
            self.tokens[i].extend(out[i])
        return out

    def _beam_tick(self, active: list, logp) -> dict:
        """Advance the resumable beam for the active slots by one tick.

        Beam mode returns the (possibly revised) RUNNING best hypothesis
        per slot — same semantics as the solo beam recognizer.
        """
        from tpuasr.decode.prefix_beam import (beam_init_state, beam_results,
                                               ctc_beam_search)
        if self._beam_state is None:
            self._beam_state = beam_init_state(self.n, self.beam_cfg)
        act = jnp.asarray(active)
        sub = jax.tree_util.tree_map(lambda x: x[act], self._beam_state)
        Tc = logp.shape[1]
        res = ctc_beam_search(
            logp, jnp.full((len(active),), Tc, jnp.int32), self.beam_cfg,
            init_state=sub, return_state=True,
            lm_bigram=self.lm_bigram, lm_eos=self.lm_eos,
            graph=self.graph)
        self._beam_state = jax.tree_util.tree_map(
            lambda full, new: full.at[act].set(new),
            self._beam_state, res["state"])
        toks = np.asarray(res["tokens"])
        tlens = np.asarray(res["token_lens"])
        out = {}
        for j, i in enumerate(active):
            self.tokens[i] = toks[j, 0, :tlens[j, 0]].tolist()
            out[i] = list(self.tokens[i])
        return out

    def flush(self, slot: int) -> list:
        """Finish one stream (pads its tails solo for exactness).

        Greedy mode returns the newly emitted tokens; beam mode returns the
        FINAL hypothesis for the slot (matching the solo recognizer)."""
        if not self.active[slot]:
            return []
        self._defuse()
        solo = self._solo
        solo.reset()
        solo._samples = self._samples[slot]
        solo._buf1 = self._buf1[slot]
        solo._buf2 = self._buf2[slot]
        if self._h is not None:
            solo._h = tuple(h[slot] for h in self._h)
        solo._prev_tok = self._prev[slot]
        if self.decode == "beam" and self._beam_state is not None:
            solo._beam_state = jax.tree_util.tree_map(
                lambda x: x[slot:slot + 1], self._beam_state)
        toks = solo.flush()
        if self.decode == "beam":
            if solo._beam_state is not None:
                from tpuasr.decode.prefix_beam import beam_results
                res = beam_results(
                    solo._beam_state, 1,
                    lm_weight=self.beam_cfg.lm_weight,
                    lm_eos=self.lm_eos,
                    graph_final=(None if self.graph is None
                                 else self.graph.final),
                    graph_weight=self.beam_cfg.graph_weight,
                    graph_final_cap=self.beam_cfg.graph_final_cap)
                n = int(res["token_lens"][0, 0])
                toks = np.asarray(res["tokens"])[0, 0, :n].tolist()
            else:
                toks = list(self.tokens[slot])
            self.tokens[slot] = list(toks)
        else:
            self.tokens[slot].extend(toks)
        self.active[slot] = False
        return toks
