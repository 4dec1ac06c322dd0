"""Bucketed batch loader (replaces the reference's AudioDataLoader/collate,
SURVEY.md section 2.1: sort-by-length + pad-to-batch-max, per-worker CPU
featurization). Here: fixed bucket shapes, wav decode on host, featurization
on device, deterministic shuffling with a resumable epoch/step cursor
(checkpointable, SURVEY.md section 5 failure-recovery row).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpuasr.data.bucketing import BucketSpec, make_buckets
from tpuasr.data.manifest import Utterance, load_wav, read_manifest


@dataclasses.dataclass
class LoaderConfig:
    batch_size: int = 8
    max_label_len: int = 64
    shuffle: bool = True
    seed: int = 0
    drop_last: bool = False
    max_waste: float = 0.2
    max_buckets: int = 6
    # Round bucket boundaries up to a multiple of this many samples so
    # shapes are stable across corpus draws (compile-cache friendly).
    bucket_quantum: int = 1
    # When set (a FeatureConfig), batches also carry per-frame labels
    # derived from utterance `segments` (frame-wise training; reference's
    # CapsNet/SSVAE mode): batch["frame_labels"] (B, T_frames) i32, blank=0.
    frame_label_cfg: object = None
    # With frame_label_cfg: utterances that carry NO `segments` get
    # frame_labels = -1 (unlabeled) instead of 0 (silence) — the
    # semi-supervised split for the ssvae_elbo objective.
    unlabeled_frames: bool = False
    # Train-time waveform augmentation (host-side, before device transfer;
    # reference's dataset offered similar perturbations [M]). Off by default.
    augment: bool = False
    gain_range: tuple = (0.8, 1.2)     # random amplitude scale
    noise_std: float = 0.0             # additive white noise (abs scale)
    # Decode uncached wavs with the native multithreaded C++ loader
    # (native/wav_batch.cc) — one call per batch instead of per-file
    # python decode; automatic scipy fallback when the lib isn't built.
    native_io: bool = True
    # Decoded-waveform LRU cache budget in bytes. The reference dataloader
    # streamed per batch; an unbounded cache would hold the whole corpus
    # uncompressed in host RAM (~7 GB / 100 h of 8 kHz float32). 0 disables
    # caching (pure streaming; batch-local scratch only).
    cache_bytes: int = 1 << 30


class AudioLoader:
    """Iterates fixed-shape batches:
    dict(wav (B, S_bucket) f32, wav_lens (B,) i32,
         tokens (B, U) i32 (pad 0), token_lens (B,) i32, ids list[str]).

    Batches are homogeneous in bucket, so an epoch touches at most
    ``len(buckets)`` distinct shapes.
    """

    def __init__(self, manifest, cfg: LoaderConfig = None,
                 bucket_spec: BucketSpec = None):
        self.cfg = cfg or LoaderConfig()
        self.utts: list[Utterance] = (
            read_manifest(manifest) if not isinstance(manifest, list)
            else manifest)
        if not self.utts:
            raise ValueError("empty manifest")
        lens = [u.num_samples for u in self.utts]
        self.buckets = bucket_spec or make_buckets(
            lens, max_waste=self.cfg.max_waste,
            max_buckets=self.cfg.max_buckets,
            quantum=self.cfg.bucket_quantum)
        import collections
        self._cache: collections.OrderedDict[str, np.ndarray] = (
            collections.OrderedDict())
        self._cache_nbytes = 0
        self._scratch: dict[str, np.ndarray] = {}   # batch-local, no budget
        self.epoch = 0
        self._aug_rng = np.random.default_rng(self.cfg.seed + 104729)

    # -- deterministic, resumable batch plan --------------------------------

    def batch_plan(self, epoch: int) -> list[list[int]]:
        """List of batches (utterance indices), grouped by bucket."""
        order = np.arange(len(self.utts))
        if self.cfg.shuffle:
            rng = np.random.default_rng(self.cfg.seed + epoch)
            rng.shuffle(order)
        by_bucket: dict[int, list[int]] = {}
        for i in order:
            b = self.buckets.bucket_of(self.utts[i].num_samples)
            if b < 0:
                b = len(self.buckets.boundaries) - 1  # truncate overlong
            by_bucket.setdefault(b, []).append(int(i))
        plan = []
        B = self.cfg.batch_size
        for b, idxs in sorted(by_bucket.items()):
            for s in range(0, len(idxs), B):
                chunk = idxs[s:s + B]
                if len(chunk) < B:
                    if self.cfg.drop_last:
                        continue
                    # Repeat-pad to full batch (keeps shapes fixed); the
                    # duplicated rows are flagged via `real` mask.
                    chunk = (chunk * ((B // len(chunk)) + 1))[:B]
                plan.append(chunk)
        if self.cfg.shuffle:
            rng = np.random.default_rng(self.cfg.seed * 7919 + epoch)
            rng.shuffle(plan)
        return plan

    def _cache_get(self, uid: str) -> np.ndarray | None:
        data = self._scratch.get(uid)
        if data is not None:
            return data
        data = self._cache.get(uid)
        if data is not None:
            self._cache.move_to_end(uid)   # LRU touch
        return data

    def _cache_put(self, uid: str, data: np.ndarray) -> None:
        if self.cfg.cache_bytes <= 0:
            self._scratch[uid] = data      # cleared at next make_batch
            return
        prev = self._cache.pop(uid, None)
        if prev is not None:
            self._cache_nbytes -= prev.nbytes
        self._cache[uid] = data
        self._cache_nbytes += data.nbytes
        # Evict LRU entries past the budget (always keep the newest one, so
        # the current batch's wavs survive until consumed or re-decoded).
        while (self._cache_nbytes > self.cfg.cache_bytes
               and len(self._cache) > 1):
            _, old = self._cache.popitem(last=False)
            self._cache_nbytes -= old.nbytes

    def _wav(self, u: Utterance) -> np.ndarray:
        data = self._cache_get(u.id)
        if data is None:
            data, sr = load_wav(u.wav)
            if sr != u.sample_rate:
                raise ValueError(f"{u.id}: sr {sr} != {u.sample_rate}")
            self._cache_put(u.id, data)
        return data

    def _prefetch(self, utts: list[Utterance]) -> None:
        """Decode a batch's uncached wavs with the native multithreaded
        loader (native/wav_batch.cc) in ONE call; falls back silently to
        per-file scipy decode when the library isn't built. Output is
        bit-identical to load_wav (verified in tests/test_native_wav.py)."""
        if not self.cfg.native_io:
            return
        todo = [u for u in utts if self._cache_get(u.id) is None]
        if len(todo) < 2:
            return
        try:
            from tpuasr.native import wav_batch_available, load_wav_batch
            if not wav_batch_available():
                return
            max_s = max(u.num_samples for u in todo)
            out, lens, srs = load_wav_batch([u.wav for u in todo], max_s)
        except (RuntimeError, OSError):
            return
        for j, u in enumerate(todo):
            if srs[j] != u.sample_rate:
                raise ValueError(f"{u.id}: sr {srs[j]} != {u.sample_rate}")
            self._cache_put(u.id, out[j, :lens[j]].copy())

    def make_batch(self, idxs: list[int]) -> dict:
        cfg = self.cfg
        self._scratch = {}
        utts = [self.utts[i] for i in idxs]
        self._prefetch(utts)
        bucket = max(self.buckets.bucket_of(u.num_samples) for u in utts)
        if bucket < 0:
            bucket = len(self.buckets.boundaries) - 1
        S = self.buckets.padded_len(bucket)
        B = len(utts)
        wav = np.zeros((B, S), np.float32)
        wav_lens = np.zeros((B,), np.int32)
        U = cfg.max_label_len
        tokens = np.zeros((B, U), np.int32)
        token_lens = np.zeros((B,), np.int32)
        seen = set()
        real = np.zeros((B,), bool)
        for j, u in enumerate(utts):
            data = self._wav(u)[:S]
            if cfg.augment:
                g = self._aug_rng.uniform(*cfg.gain_range)
                data = data * g
                if cfg.noise_std > 0:
                    data = data + self._aug_rng.normal(
                        0.0, cfg.noise_std, size=len(data)).astype(
                            np.float32)
            wav[j, :len(data)] = data
            wav_lens[j] = len(data)
            toks = u.tokens[:U]
            tokens[j, :len(toks)] = toks
            token_lens[j] = len(toks)
            real[j] = u.id not in seen
            seen.add(u.id)
        out = dict(wav=wav, wav_lens=wav_lens, tokens=tokens,
                   token_lens=token_lens, ids=[u.id for u in utts],
                   real=real)
        fc = self.cfg.frame_label_cfg
        if fc is not None:
            from tpuasr.features.reference import num_frames
            T = int(num_frames(fc, S))
            fl = np.zeros((B, max(T, 1)), np.int32)
            for j, u in enumerate(utts):
                if self.cfg.unlabeled_frames and not u.segments:
                    fl[j, :] = -1
                    continue
                for tok, s0, s1 in u.segments:
                    # Label frames whose center falls inside the segment.
                    center0 = fc.win_length // 2
                    t0 = max(0, -(-(s0 - center0) // fc.hop_length))
                    t1 = min(T, (s1 - center0) // fc.hop_length + 1)
                    fl[j, t0:t1] = tok
            out["frame_labels"] = fl
        return out

    def __iter__(self):
        for chunk in self.batch_plan(self.epoch):
            yield self.make_batch(chunk)
        self.epoch += 1

    def __len__(self):
        return len(self.batch_plan(self.epoch))
