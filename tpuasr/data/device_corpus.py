"""Device-resident corpus: batch assembly ON the chip.

VERDICT r3 weak #5 / next #6: sustained training ran at ~27% of the
isolated step rate because every step re-did host work the corpus size
never justified — wav decode (epoch 0 only, LRU-cached after), numpy
pack into fresh padded arrays, and a multi-MB host->device transfer of
audio that had already crossed the PCIe/tunnel boundary in the previous
epoch. The reference's answer was worker processes in the dataloader
(SURVEY.md section 2.1 AudioDataLoader row: per-worker CPU collate);
the TPU-native answer is residency: a training corpus that fits HBM is
uploaded ONCE, and every batch is a device-side row gather.

Mechanics
  * One store per bucket (fixed padded length S_b, so shapes stay
    compile-stable): wav (N_b, S_b) f32, wav_lens/token_lens (N_b,) i32,
    tokens (N_b, U) i32, optional frame_labels — built with EXACTLY the
    same truncation/padding rules as ``AudioLoader.make_batch`` and
    uploaded replicated over the mesh.
  * ``batches(epoch)`` walks the loader's own deterministic
    ``batch_plan(epoch)`` (bit-identical batch composition and order —
    resume-exactness is untouched) and emits device batches from a
    jitted gather whose outputs are sharded over the data axis, i.e.
    the same placement ``shard_batch`` would have produced, without the
    transfer. The ``real`` de-duplication mask (repeat-padded final
    chunk) is recomputed on device from index equality.
  * Anything the gather can't reproduce falls back to streaming:
    waveform augmentation (host RNG state), Grain pipelines, or a
    corpus over ``max_bytes`` (residency is an optimization for the
    fits-in-HBM regime, not a replacement for the streaming loader).

Equality with the streaming path is asserted in
tests/test_device_corpus.py (bit-identical batches, identical trained
params over a multi-epoch run).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpuasr.data.loader import AudioLoader
from tpuasr.parallel.mesh import batch_sharding, replicated_sharding


def _frame_labels_for(u, fc, S: int, unlabeled: bool) -> np.ndarray:
    """Per-utterance frame labels — same rule as AudioLoader.make_batch."""
    from tpuasr.features.reference import num_frames
    T = max(int(num_frames(fc, S)), 1)
    fl = np.zeros((T,), np.int32)
    if unlabeled and not u.segments:
        fl[:] = -1
        return fl
    for tok, s0, s1 in u.segments:
        center0 = fc.win_length // 2
        t0 = max(0, -(-(s0 - center0) // fc.hop_length))
        t1 = min(T, (s1 - center0) // fc.hop_length + 1)
        fl[t0:t1] = tok
    return fl


class DeviceCorpus:
    """Whole-corpus HBM residency for an :class:`AudioLoader`.

    Raises ``ValueError`` when the loader's configuration can't be
    reproduced by a device gather (use :func:`try_build` for the
    auto-fallback behavior).
    """

    def __init__(self, loader: AudioLoader, mesh, max_bytes: int = 4 << 30):
        cfg = loader.cfg
        if cfg.augment:
            raise ValueError("augment uses host RNG state per epoch; "
                             "stream instead")
        self.loader = loader
        self.mesh = mesh
        nb = len(loader.buckets.boundaries)
        # bucket -> rows, global utt idx -> (bucket, row)
        by_bucket: dict[int, list[int]] = {}
        self._row_of = np.zeros((len(loader.utts), 2), np.int32)
        for i, u in enumerate(loader.utts):
            b = loader.buckets.bucket_of(u.num_samples)
            if b < 0:
                b = nb - 1
            rows = by_bucket.setdefault(b, [])
            self._row_of[i] = (b, len(rows))
            rows.append(i)
        total = 0
        for b, rows in by_bucket.items():
            S = loader.buckets.padded_len(b)
            total += len(rows) * (S * 4 + cfg.max_label_len * 4 + 8)
        if total > max_bytes:
            raise ValueError(f"corpus store {total/2**20:.0f} MiB exceeds "
                             f"budget {max_bytes/2**20:.0f} MiB; stream")
        self.nbytes = total
        rep = replicated_sharding(mesh)
        self._stores: dict[int, dict[str, jax.Array]] = {}
        for b, rows in sorted(by_bucket.items()):
            S = loader.buckets.padded_len(b)
            N = len(rows)
            wav = np.zeros((N, S), np.float32)
            wav_lens = np.zeros((N,), np.int32)
            tokens = np.zeros((N, cfg.max_label_len), np.int32)
            token_lens = np.zeros((N,), np.int32)
            fls = [] if cfg.frame_label_cfg is not None else None
            for r, i in enumerate(rows):
                u = loader.utts[i]
                data = loader._wav(u)[:S]
                wav[r, :len(data)] = data
                wav_lens[r] = len(data)
                toks = u.tokens[:cfg.max_label_len]
                tokens[r, :len(toks)] = toks
                token_lens[r] = len(toks)
                if fls is not None:
                    fls.append(_frame_labels_for(
                        u, cfg.frame_label_cfg, S, cfg.unlabeled_frames))
            store = dict(wav=wav, wav_lens=wav_lens, tokens=tokens,
                         token_lens=token_lens)
            if fls is not None:
                store["frame_labels"] = np.stack(fls)
            self._stores[b] = {k: jax.device_put(v, rep)
                               for k, v in store.items()}
        # Keep the loader's decode cache from doubling host RAM: residency
        # supersedes it (the store IS the cache now).
        loader._cache.clear()
        loader._cache_nbytes = 0
        # batch_plan always emits full-size chunks (repeat-padded), so the
        # batch dim is cfg.batch_size; replicate when it doesn't divide the
        # data axis (same rule as parallel.shard_batch).
        from tpuasr.parallel.mesh import DATA_AXIS
        divisible = cfg.batch_size % mesh.shape[DATA_AXIS] == 0
        self._gather = jax.jit(
            _gather_batch,
            out_shardings=dict_shardings(
                mesh, cfg.frame_label_cfg is not None, divisible))

    def batches(self, epoch: int):
        """Yield (n_real_utts, device_batch) — same plan, order, and
        contents as the streaming loader, assembled on device."""
        plan = self.loader.batch_plan(epoch)
        for chunk in plan:
            b = int(self._row_of[chunk[0], 0])
            rows = self._row_of[np.asarray(chunk, np.int32), 1]
            yield len(set(chunk)), self._gather(self._stores[b],
                                                jnp.asarray(rows))


def dict_shardings(mesh, with_frames: bool, divisible: bool = True):
    sh = batch_sharding(mesh) if divisible else replicated_sharding(mesh)
    out = dict(wav=sh, wav_lens=sh, tokens=sh, token_lens=sh, real=sh)
    if with_frames:
        out["frame_labels"] = sh
    return out


def _gather_batch(store: dict, rows: jax.Array) -> dict:
    out = {k: jnp.take(v, rows, axis=0) for k, v in store.items()}
    # De-dup mask: a row is "real" at its first occurrence only (the
    # final chunk of a bucket is repeat-padded to full batch size).
    dup = jnp.tril(rows[:, None] == rows[None, :], k=-1).any(axis=1)
    out["real"] = ~dup
    return out


def try_build(loader: AudioLoader, mesh,
              max_bytes: int = 4 << 30) -> DeviceCorpus | None:
    """DeviceCorpus or None when the config requires streaming."""
    try:
        return DeviceCorpus(loader, mesh, max_bytes=max_bytes)
    except ValueError:
        return None
