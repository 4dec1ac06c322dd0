"""Edge-case coverage: large class counts (phone-inventory scale), loader
truncation of overlong utterances, bf16 compute path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import BeamSearchConfig, ctc_beam_search, greedy_decode


def test_beam_large_class_count(rng):
    """C=200 (ASpIRE-phone scale, > one lane tile) through the XLA beam."""
    B, T, C = 2, 15, 200
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T, T - 4])
    cfg = BeamSearchConfig(beam_width=8, class_topk=16, max_len=T)
    out = ctc_beam_search(lp, lens, cfg)
    assert np.all(np.asarray(out["token_lens"]) <= T)
    toks = np.asarray(out["tokens"])[0, 0]
    n = int(out["token_lens"][0, 0])
    assert np.all((toks[:n] > 0) & (toks[:n] < C))


def test_pallas_beam_large_class_count(rng):
    """C=200 -> C_pad=256 path in the Pallas kernel (interp on CPU).

    DEFAULT tier on purpose (was slow-tier): the round-3 join union-tile
    rewrite shipped a C_pad>LANES shape bug that only this shape class
    catches — the default gate must cover it (~15 s, mostly trace time).
    """
    from jax.experimental.pallas import tpu as pltpu
    from tpuasr.decode.pallas_beam import ctc_beam_search_pallas
    B, T, C = 1, 6, 200
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    lens = jnp.array([T])
    cfg = BeamSearchConfig(beam_width=4, class_topk=C - 1, max_len=T)
    ctx = (pltpu.force_tpu_interpret_mode()
           if jax.default_backend() != "tpu" else _null())
    with ctx:
        a = ctc_beam_search(lp, lens, cfg)
        b = ctc_beam_search_pallas(lp, lens, cfg)
    na = int(a["token_lens"][0, 0])
    nb = int(b["token_lens"][0, 0])
    assert na == nb
    np.testing.assert_array_equal(np.asarray(a["tokens"])[0, 0, :na],
                                  np.asarray(b["tokens"])[0, 0, :nb])
    np.testing.assert_allclose(float(a["scores"][0, 0]),
                               float(b["scores"][0, 0]), rtol=1e-4)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_loader_truncates_overlong(tmp_path, rng):
    from tpuasr.data import AudioLoader, LoaderConfig
    from tpuasr.data.bucketing import BucketSpec
    from tpuasr.data.manifest import Utterance, write_manifest
    from scipy.io import wavfile
    wavs = []
    for i, n in enumerate([8000, 24000]):   # second exceeds the bucket
        p = tmp_path / f"u{i}.wav"
        wavfile.write(p, 8000,
                      (rng.standard_normal(n) * 3000).astype(np.int16))
        wavs.append(Utterance(id=f"u{i}", wav=str(p), tokens=[1, 2],
                              num_samples=n, sample_rate=8000))
    write_manifest(tmp_path / "m.jsonl", wavs)
    loader = AudioLoader(tmp_path / "m.jsonl",
                         LoaderConfig(batch_size=2, max_label_len=4),
                         bucket_spec=BucketSpec((16000,)))
    batch = loader.make_batch(loader.batch_plan(0)[0])
    assert batch["wav"].shape[1] == 16000
    assert batch["wav_lens"].max() == 16000   # truncated, not crashed


def test_bf16_compute_train_step(tmp_path):
    from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
    from tpuasr.features import FeatureConfig
    from tpuasr.train import TrainConfig, Trainer
    corpus = make_synthetic_corpus(tmp_path, num_utts=4, vocab_size=5)
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8))
    cfg = TrainConfig(model="resnet_ctc", num_classes=5,
                      model_kwargs=dict(stem_channels=8,
                                        stage_channels=(8,),
                                        blocks_per_stage=1, dropout=0.0),
                      bf16_compute=True, warmup_steps=1)
    trainer = Trainer(cfg, FeatureConfig(n_mels=32))
    batch = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(batch)
    state, m = trainer.train_step(state, trainer._device_batch(batch))
    assert np.isfinite(float(m["loss"]))


def test_lazy_top_level_api():
    import tpuasr
    assert tpuasr.FeatureConfig is not None
    assert tpuasr.Trainer is not None
    assert callable(tpuasr.make_synthetic_corpus)
    with pytest.raises(AttributeError):
        tpuasr.not_a_real_symbol


def test_compile_cache_repairs_orphaned_lru_metadata(tmp_path):
    """Entries written before the LRU bound lack `-atime` twins; jax's
    LRUCache raises on every put until they are backfilled."""
    from tpuasr.utils.compile_cache import _repair_lru_metadata

    old = tmp_path / "jit_f-aaaa-cache"
    old.write_bytes(b"x" * 16)
    paired = tmp_path / "jit_g-bbbb-cache"
    paired.write_bytes(b"y")
    (tmp_path / "jit_g-bbbb-atime").write_bytes((7).to_bytes(8, "little"))
    dangling = tmp_path / "jit_h-cccc-atime"
    dangling.write_bytes((9).to_bytes(8, "little"))

    _repair_lru_metadata(tmp_path)

    backfilled = tmp_path / "jit_f-aaaa-atime"
    assert backfilled.exists()
    ts = int.from_bytes(backfilled.read_bytes(), "little")
    assert ts == int(old.stat().st_mtime * 1e9)
    # paired entry untouched, dangling atime removed
    assert (tmp_path / "jit_g-bbbb-atime").read_bytes() == (7).to_bytes(8, "little")
    assert not dangling.exists()


def test_compile_cache_disabled_on_cpu_backend(monkeypatch, tmp_path):
    """XLA:CPU executable (de)serialization destabilizes long processes
    (two SIGSEGVs + a futex hang, round 3) — on the CPU backend the
    persistent cache must stay OFF unless explicitly opted in."""
    import tpuasr.utils.compile_cache as cc

    monkeypatch.setenv("TPUASR_JAX_CACHE", str(tmp_path))
    monkeypatch.delenv("TPUASR_JAX_CACHE_CPU", raising=False)
    # conftest pinned this whole process to CPU, so conftest's own enable
    # call was gated off too:
    assert not cc._enabled
    assert cc.enable_compilation_cache() is None
