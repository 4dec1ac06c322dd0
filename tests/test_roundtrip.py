"""Checkpoint round-trip for EVERY registry model: train one step via the
Trainer, save, reload via load_for_inference + ckpt meta, run forward —
the predict.py code path must be able to serve any trained model."""

import numpy as np
import pytest

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.models import MODEL_REGISTRY, create_model
from tpuasr.train import TrainConfig, Trainer
from tpuasr.train.checkpoints import load_for_inference, save_checkpoint

SMALL_KWARGS = {
    "resnet_ctc": dict(stem_channels=8, stage_channels=(8,),
                       blocks_per_stage=1, dropout=0.0),
    "resnet_ed": dict(stem_channels=8, stage_channels=(8,),
                      blocks_per_stage=1, dec_hidden=16, emb_dim=8,
                      dropout=0.0),
    "deepspeech_ctc": dict(rnn_hidden=16, rnn_layers=1, conv_channels=4,
                           dropout=0.0),
    "deepspeech_var": dict(rnn_hidden=16, rnn_layers=2, conv_channels=4,
                           dropout=0.0),
    "capsule1": dict(conv_channels=8, primary_caps=4, primary_dim=4,
                     class_dim=8),
    "ssvae": dict(latent_dim=8, hidden=(32,)),
}

OBJECTIVE = {"resnet_ed": "seq2seq_ce", "ssvae": "framewise_ce"}


@pytest.mark.parametrize("name", [
    n if n == "resnet_ctc" else pytest.param(n, marks=pytest.mark.slow)
    for n in sorted(MODEL_REGISTRY)])
def test_train_save_reload_forward(name, tmp_path):
    fc = FeatureConfig(n_mels=32)
    corpus = make_synthetic_corpus(tmp_path / "c", num_utts=4, vocab_size=5,
                                   min_tokens=2, max_tokens=3)
    objective = OBJECTIVE.get(name, "ctc")
    loader = AudioLoader(
        corpus.manifest,
        LoaderConfig(batch_size=4, max_label_len=4,
                     frame_label_cfg=fc if objective == "framewise_ce"
                     else None))
    cfg = TrainConfig(model=name, num_classes=5,
                      model_kwargs=SMALL_KWARGS[name], objective=objective,
                      label_stride=1 if name == "ssvae" else 2,
                      warmup_steps=1)
    trainer = Trainer(cfg, fc)
    batch = loader.make_batch(loader.batch_plan(0)[0])
    state = trainer.init_state(batch)
    state, m = trainer.train_step(state, trainer._device_batch(batch))
    assert np.isfinite(float(m["loss"])), name

    import jax
    path = save_checkpoint(tmp_path / "ckpt", jax.device_get(state), 1,
                           meta=trainer.ckpt_meta(0))
    variables, meta = load_for_inference(tmp_path / "ckpt")
    assert meta["model"] == name
    model = create_model(meta["model"], num_classes=meta["num_classes"],
                         **meta["model_kwargs"])
    fz = Featurizer(FeatureConfig(**meta["feature"]))
    feats, flens = fz(batch["wav"], batch["wav_lens"])
    logp, out_lens = model.apply(variables, feats, flens, train=False)
    assert logp.shape[0] == 4
    assert np.all(np.isfinite(np.asarray(logp)))
