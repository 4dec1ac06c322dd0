"""End-to-end training integration (SURVEY.md section 4.2: tiny synthetic
corpus, train-steps-decrease-loss, checkpoint resume, 8-device DP mesh)."""

import numpy as np
import pytest

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.features import FeatureConfig
from tpuasr.train import TrainConfig, Trainer


def small_cfg(tmp_path, **kw):
    defaults = dict(
        model="deepspeech_ctc",
        model_kwargs=dict(rnn_hidden=32, rnn_layers=1, conv_channels=4,
                          dropout=0.0),
        num_classes=6, lr=3e-3, num_epochs=2, warmup_steps=10,
        log_every=1000, ckpt_dir=str(tmp_path / "ckpt"),
        ckpt_every_steps=10**9)
    defaults.update(kw)
    return TrainConfig(**defaults)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(root, num_utts=16, vocab_size=6,
                                 min_tokens=2, max_tokens=4)


def feat_cfg():
    return FeatureConfig(n_mels=32)


@pytest.mark.slow
def test_train_reduces_loss(corpus, tmp_path):
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8))
    trainer = Trainer(small_cfg(tmp_path), feat_cfg())
    init_batch = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(init_batch)

    first_loss = None
    for epoch in range(4):
        loader.epoch = epoch
        for batch in loader:
            state, m = trainer.train_step(state, trainer._device_batch(batch))
            if first_loss is None:
                first_loss = float(m["loss"])
    last_loss = float(m["loss"])
    assert last_loss < first_loss * 0.8, (first_loss, last_loss)


@pytest.mark.slow
def test_fit_and_resume(corpus, tmp_path):
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8))
    dev = AudioLoader(corpus.manifest,
                      LoaderConfig(batch_size=4, max_label_len=8,
                                   shuffle=False))
    cfg = small_cfg(tmp_path, num_epochs=1)
    trainer = Trainer(cfg, feat_cfg())
    state = trainer.fit(loader, dev_loader=dev,
                        metrics_dir=str(tmp_path / "metrics"))
    assert state is not None
    step1 = int(state.step)
    assert step1 > 0
    # metrics CSV written
    assert (tmp_path / "metrics" / "metrics.csv").exists()

    # Resume: --continue-from semantics.
    cfg2 = small_cfg(tmp_path, num_epochs=2,
                     continue_from=str(tmp_path / "ckpt"))
    trainer2 = Trainer(cfg2, feat_cfg())
    state2 = trainer2.fit(loader)
    assert int(state2.step) > step1


@pytest.mark.slow
def test_data_parallel_mesh(corpus, tmp_path):
    """Same batch, 1-device vs 8-device data-parallel mesh: same loss."""
    import jax
    from tpuasr.parallel import make_mesh
    assert len(jax.devices()) == 8
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=8, max_label_len=8))
    batch = loader.make_batch(loader.batch_plan(0)[0])

    t1 = Trainer(small_cfg(tmp_path), feat_cfg(),
                 mesh=make_mesh(n_data=1, devices=jax.devices()[:1]))
    t8 = Trainer(small_cfg(tmp_path), feat_cfg(), mesh=make_mesh(n_data=8))
    s1 = t1.init_state(batch)
    s8 = t8.init_state(batch)
    # NOTE: train_step donates the state buffers — never reuse the input.
    s1, m1 = t1.train_step(s1, t1._device_batch(batch))
    s8, m8 = t8.train_step(s8, t8._device_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)

    # More steps on the 8-device mesh keep improving (end-to-end DP update).
    s8, m8a = t8.train_step(s8, t8._device_batch(batch))
    for _ in range(8):
        s8, m8b = t8.train_step(s8, t8._device_batch(batch))
    assert float(m8b["loss"]) < float(m8a["loss"])


def test_orbax_checkpointer(corpus, tmp_path):
    import jax
    from tpuasr.train.checkpoints import OrbaxCheckpointer
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=4, max_label_len=8))
    trainer = Trainer(small_cfg(tmp_path), feat_cfg())
    batch = loader.make_batch(loader.batch_plan(0)[0])
    # init_state only: the orbax property under test is save/restore
    # equality of a real TrainState pytree; compiling train_step here added
    # ~15 s of pure XLA compile for nothing (train_step itself is covered
    # by test_loss_decreases and friends).
    state = trainer.init_state(batch)

    ckpt = OrbaxCheckpointer(tmp_path / "orbax", keep=2)
    ckpt.save(state, int(state.step), meta={"epoch": 0})
    ckpt.wait()
    template = jax.device_get(state)
    restored, step = ckpt.restore(template)
    assert step == int(state.step)
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(restored.params
                                  if hasattr(restored, "params")
                                  else restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_shard_map_step_matches_jit_step(corpus, tmp_path):
    """Explicit shard_map + pmean == jit-with-shardings train step."""
    import jax
    from tpuasr.parallel import make_mesh
    from tpuasr.parallel.shard_map_step import make_shard_map_train_step
    loader = AudioLoader(corpus.manifest,
                         LoaderConfig(batch_size=8, max_label_len=8))
    batch = loader.make_batch(loader.batch_plan(0)[0])
    mesh = make_mesh(n_data=8)
    # dropout=0 so the two paths' RNG usage doesn't diverge the comparison;
    # the shard_map path folds in the shard index for per-shard dropout.
    trainer = Trainer(small_cfg(tmp_path), feat_cfg(), mesh=mesh)
    s1 = trainer.init_state(batch)
    s2 = jax.tree_util.tree_map(lambda x: x.copy(), s1)

    s1, m1 = trainer.train_step(s1, trainer._device_batch(batch))
    sm_step = make_shard_map_train_step(trainer)
    s2, m2 = sm_step(s2, trainer._device_batch(batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    # Params after one update agree to numerical tolerance.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_prefetch_and_grain_paths_bit_identical(corpus, tmp_path):
    """The background-thread prefetch path and the Grain pipeline path must
    produce the SAME batches in the SAME order as the synchronous loop —
    final params bit-identical (VERDICT r2 item 4: pipeline on the product
    path without touching numerics)."""
    import jax

    def run(**kw):
        loader = AudioLoader(corpus.manifest,
                             LoaderConfig(batch_size=4, max_label_len=8))
        cfg = small_cfg(tmp_path / f"pf{len(kw)}", num_epochs=1, **kw)
        trainer = Trainer(cfg, feat_cfg())
        return jax.device_get(trainer.fit(loader).params)

    p_sync = run(prefetch=0)
    p_thread = run(prefetch=2)
    for a, b in zip(jax.tree_util.tree_leaves(p_sync),
                    jax.tree_util.tree_leaves(p_thread)):
        np.testing.assert_array_equal(a, b)
    from tpuasr.data.grain_pipeline import GRAIN_AVAILABLE
    if GRAIN_AVAILABLE:
        p_grain = run(prefetch=2, use_grain=True)
        for a, b in zip(jax.tree_util.tree_leaves(p_sync),
                        jax.tree_util.tree_leaves(p_grain)):
            np.testing.assert_array_equal(a, b)
