"""Jitted train/eval steps + epoch loop, data-parallel over the mesh.

Reference call stack replaced (SURVEY.md section 3.1): per-epoch python loop ->
forward -> warp-ctc -> backward -> clip -> SGD/Adam step -> periodic dev eval,
checkpoint, tensorboard. Here the whole train step (featurize -> AM ->
CTC -> grads -> psum over ICI -> clipped update) is ONE jitted program; the
host only feeds fixed-shape bucketed numpy batches.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpuasr.data.loader import AudioLoader
from tpuasr.decode import greedy_decode
from tpuasr.features import FeatureConfig, Featurizer
from tpuasr.losses import get_ctc_loss
from tpuasr.models import create_model
from tpuasr.parallel import (make_mesh, replicated_sharding,
                             shard_batch)
from tpuasr.train.checkpoints import (restore_checkpoint,
                                      save_checkpoint)
from tpuasr.utils.logger import MetricsWriter, init_logger
from tpuasr.utils.metrics import wer


@dataclasses.dataclass
class TrainConfig:
    model: str = "deepspeech_ctc"
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    num_classes: int = 64
    optimizer: str = "adamw"         # adamw | adam | sgd
    lr: float = 3e-4
    weight_decay: float = 1e-6
    momentum: float = 0.9
    warmup_steps: int = 200
    grad_clip: float = 5.0
    num_epochs: int = 10
    seed: int = 0
    log_every: int = 10
    ckpt_dir: str | None = None
    ckpt_every_steps: int = 500
    continue_from: str | None = None
    bf16_compute: bool = False
    ctc_impl: str = "auto"           # auto | ref | fb | pallas
    fused_featurizer: bool = False   # Pallas fused featurizer kernel
    # Objective: "ctc" (sequence training), "framewise_ce" (per-frame
    # cross-entropy on aligned frame labels — the reference's CapsNet/SSVAE
    # frame-classifier mode; requires LoaderConfig.frame_label_cfg), or
    # "ssvae_elbo" (model "ssvae" only: the M2 semi-supervised objective —
    # supervised ELBO on labeled frames, enumerated ELBO on unlabeled ones
    # (frame_labels == -1); reference asr/models/ssvae Pyro SVI loop,
    # SURVEY.md section 3.5).
    objective: str = "ctc"
    label_stride: int = 2            # model time downsampling for framewise
    ssvae_alpha: float = 1.0         # classifier weight in the M2 loss
    # Host input pipeline (VERDICT r2 item 4: decode/pack/upload of batch
    # N+1 overlaps step N instead of sitting on the step's critical path).
    # prefetch: queue depth of the background host thread (0 = synchronous).
    prefetch: int = 2
    # Device-resident corpus (data/device_corpus.py): when the training
    # corpus fits the byte budget (and no host-side augmentation / Grain
    # pipeline is in play), decoded wavs upload ONCE and every batch is a
    # device-side row gather — the host input pipeline and the per-step
    # audio transfer disappear from the critical path entirely. Batches
    # are bit-identical to the streaming path (same deterministic plan),
    # so resume-exactness and mesh-equality are unaffected. "auto" falls
    # back to streaming when ineligible; True raises if ineligible;
    # False streams.
    device_corpus: bool | str = "auto"
    device_corpus_bytes: int = 4 << 30
    # use_grain: route batches through GrainAudioPipeline — same batches,
    # plus a checkpointable mid-epoch iterator (grain_workers>0 adds
    # multiprocess workers; keep 0 on single-core hosts).
    use_grain: bool = False
    grain_workers: int = 0
    # On-device SpecAugment inside the jitted train step (train only; see
    # tpuasr/features/augment.py). The reference predates SpecAugment.
    spec_augment: bool = False
    sa_freq_masks: int = 2
    sa_freq_width: int = 12
    sa_time_masks: int = 2
    sa_time_frac: float = 0.05
    # Gradient accumulation: optimizer updates apply every accum_steps
    # micro-batches (optax.MultiSteps) — large effective batches without
    # the memory. warmup counts MICRO steps.
    accum_steps: int = 1
    # LR schedule: "warmup" (linear ramp, then constant — the reference's
    # fixed-lr behavior after warmup) or "cosine" (ramp then cosine decay
    # to lr * min_lr_frac over decay_steps).
    lr_schedule: str = "warmup"
    decay_steps: int = 10000
    min_lr_frac: float = 0.05


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, max(cfg.warmup_steps, 1),
            max(cfg.decay_steps, cfg.warmup_steps + 1),
            end_value=cfg.lr * cfg.min_lr_frac)
    elif cfg.lr_schedule == "warmup":
        sched = optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1))
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=cfg.momentum, nesterov=True)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    if cfg.accum_steps > 1:
        # Clip-then-accumulate matches the per-micro-batch clipping of a
        # plain small-batch run; updates apply on every accum_steps-th step.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


class Trainer:
    def __init__(self, cfg: TrainConfig, feat_cfg: FeatureConfig = None,
                 mesh=None, logger=None):
        self.cfg = cfg
        self.feat_cfg = feat_cfg or FeatureConfig()
        if cfg.fused_featurizer:
            from tpuasr.features.pallas_fused import FusedFeaturizer
            self.featurizer = FusedFeaturizer(self.feat_cfg)
        else:
            self.featurizer = Featurizer(self.feat_cfg)
        self._ctc = get_ctc_loss(cfg.ctc_impl)
        self.model = create_model(cfg.model, num_classes=cfg.num_classes,
                                  **cfg.model_kwargs)
        self.optimizer = make_optimizer(cfg)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.log = logger or init_logger()
        self._compiled = {}
        self._grain = None               # set by fit() when cfg.use_grain
        self._dc = None                  # (loader id, DeviceCorpus | None)

    def _device_corpus_for(self, loader):
        """Build (once per loader) the HBM-resident corpus, or None when
        the loader's config requires the streaming path."""
        if self._dc is not None and self._dc[0] == id(loader):
            return self._dc[1]
        from tpuasr.data.device_corpus import DeviceCorpus, try_build
        if self.cfg.device_corpus == "auto":
            dc = try_build(loader, self.mesh,
                           max_bytes=self.cfg.device_corpus_bytes)
        else:
            dc = DeviceCorpus(loader, self.mesh,
                              max_bytes=self.cfg.device_corpus_bytes)
        if dc is not None:
            self.log.info("device-resident corpus: %.0f MiB in HBM, "
                          "%d buckets", dc.nbytes / 2 ** 20,
                          len(dc._stores))
        self._dc = (id(loader), dc)
        return dc

    # ---- state ----

    def init_state(self, sample_batch) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        feats, flens = self.featurizer(
            jnp.asarray(sample_batch["wav"]),
            jnp.asarray(sample_batch["wav_lens"]))
        init_kwargs = {}
        if self.cfg.objective == "seq2seq_ce":
            # Decoder params only materialize on the teacher-forcing path.
            tokens = jnp.asarray(sample_batch["tokens"])
            init_kwargs = dict(
                labels_in=jnp.zeros_like(tokens),
                label_lens=jnp.asarray(sample_batch["token_lens"]))
        # jit the init: eager init would dispatch every op separately, which
        # is pathologically slow under the remote-compile TPU plugin.
        variables = jax.jit(self.model.init,
                            static_argnames=("train",))(
                                rng, feats, flens, train=False, **init_kwargs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.optimizer.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        rep = replicated_sharding(self.mesh)
        return jax.device_put(state, rep)

    def num_params(self, state) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))

    # ---- steps ----

    @property
    def feat_tables(self):
        """Featurizer device-array operands; thread through the jitted
        steps as an ARGUMENT (never capture: multi-MB embedded constants
        permanently degrade dispatch on the axon terminal — chip_smoke's
        dispatch-health check guards this)."""
        return getattr(self.featurizer, "tables", None)

    def _loss_fn(self, params, batch_stats, batch, dropout_rng, train,
                 ftabs=None):
        dither_key = None
        if train and self.feat_cfg.dither > 0 and dropout_rng is not None:
            dither_key = jax.random.fold_in(dropout_rng, 1)
        feats, flens = self.featurizer._featurize(batch["wav"],
                                                  batch["wav_lens"],
                                                  dither_key,
                                                  tables=ftabs)
        if train and self.cfg.spec_augment and dropout_rng is not None:
            from tpuasr.features.augment import spec_augment
            feats = spec_augment(
                feats, flens, jax.random.fold_in(dropout_rng, 7),
                freq_masks=self.cfg.sa_freq_masks,
                freq_width=self.cfg.sa_freq_width,
                time_masks=self.cfg.sa_time_masks,
                time_frac=self.cfg.sa_time_frac)
        if self.cfg.bf16_compute:
            feats = feats.astype(jnp.bfloat16)
        if self.cfg.objective == "ssvae_elbo":
            return self._ssvae_elbo_loss(params, batch_stats, batch, feats,
                                         flens, dropout_rng)
        variables = {"params": params, "batch_stats": batch_stats}
        seq2seq = self.cfg.objective == "seq2seq_ce"
        kwargs = {}
        if seq2seq:
            # Teacher-forced decoder (ResNetED): BOS = blank id 0; the model
            # returns decoder logits (B, U, C) instead of CTC log-probs.
            tokens = batch["tokens"]
            kwargs = dict(
                labels_in=jnp.concatenate(
                    [jnp.zeros_like(tokens[:, :1]), tokens[:, :-1]], axis=1),
                label_lens=batch["token_lens"])
        if train:
            (logp, out_lens), updates = self.model.apply(
                variables, feats, flens, train=True, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng}, **kwargs)
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            logp, out_lens = self.model.apply(variables, feats, flens,
                                              train=False, **kwargs)
            new_stats = batch_stats
        w = batch["real"].astype(jnp.float32)
        if seq2seq:
            tokens = batch["tokens"]
            lsm = jax.nn.log_softmax(logp.astype(jnp.float32), -1)
            ce = -jnp.take_along_axis(lsm, tokens[:, :, None],
                                      axis=2)[..., 0]
            lmask = (jnp.arange(tokens.shape[1])[None, :]
                     < batch["token_lens"][:, None]).astype(jnp.float32)
            lmask = lmask * w[:, None]
            loss = jnp.sum(ce * lmask) / jnp.maximum(jnp.sum(lmask), 1.0)
            return loss, (new_stats, lsm, out_lens)
        if self.cfg.objective == "framewise_ce":
            logp32 = logp.astype(jnp.float32)
            Tp = logp32.shape[1]
            fl = batch["frame_labels"][:, ::self.cfg.label_stride][:, :Tp]
            fl = jnp.pad(fl, ((0, 0), (0, Tp - fl.shape[1])))
            fmask = (jnp.arange(Tp)[None, :] < out_lens[:, None])
            fmask = fmask.astype(jnp.float32) * w[:, None]
            ce = -jnp.take_along_axis(logp32, fl[:, :, None], axis=2)[..., 0]
            loss = jnp.sum(ce * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
        else:
            losses = self._ctc(logp.astype(jnp.float32), batch["tokens"],
                               out_lens, batch["token_lens"])
            loss = jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, (new_stats, logp, out_lens)

    def _ssvae_elbo_loss(self, params, batch_stats, batch, feats, flens,
                         rng):
        """M2 semi-supervised ELBO over frames: supervised where
        frame_labels >= 0, label-enumerated unsupervised where == -1
        (the loader marks segment-less utterances that way when
        LoaderConfig.unlabeled_frames is set)."""
        from tpuasr.models.ssvae import SSVAE, SSVAELoss
        if self.cfg.model != "ssvae":
            raise ValueError("objective 'ssvae_elbo' requires model 'ssvae'")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        C = self.cfg.num_classes
        B, Tp, F = feats.shape
        x = feats.reshape(B * Tp, F).astype(jnp.float32)
        fl = batch["frame_labels"][:, :Tp]
        fl = jnp.pad(fl, ((0, 0), (0, Tp - fl.shape[1])),
                     constant_values=-1)
        w = batch["real"].astype(jnp.float32)
        valid = ((jnp.arange(Tp)[None, :] < flens[:, None])
                 & (w[:, None] > 0)).reshape(B * Tp)
        fl_flat = fl.reshape(B * Tp)
        sup_m = (valid & (fl_flat >= 0)).astype(jnp.float32)
        uns_m = (valid & (fl_flat < 0)).astype(jnp.float32)

        mdl = SSVAE(num_classes=C,
                    **{k: v for k, v in self.cfg.model_kwargs.items()
                       if k in ("latent_dim", "hidden")})
        # The SSVAEAM adapter nests the module under params["ssvae"].
        variables = {"params": params["ssvae"]}
        lobj = SSVAELoss(num_classes=C, alpha=self.cfg.ssvae_alpha)
        sup_l, logits = lobj.supervised_frames(
            mdl, variables, x, jnp.maximum(fl_flat, 0),
            jax.random.fold_in(rng, 2))
        uns_l = lobj.unsupervised_frames(mdl, variables, x,
                                         jax.random.fold_in(rng, 3))
        denom = jnp.maximum(jnp.sum(sup_m) + jnp.sum(uns_m), 1.0)
        loss = (jnp.sum(sup_l * sup_m) + jnp.sum(uns_l * uns_m)) / denom
        logp = jax.nn.log_softmax(logits, -1).reshape(B, Tp, C)
        return loss, (batch_stats, logp, flens)

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: TrainState, batch: dict,
                   ftabs=None) -> tuple:
        # ftabs: featurizer tables as a (non-donated) argument — pass
        # Trainer.feat_tables; None falls back to capture (fine for the
        # plain Featurizer's KB-scale tables, poisonous for the fused
        # featurizer's MB-scale ones).
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 1),
                                 state.step)
        (loss, (new_stats, _, _)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, rng, True, ftabs)
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch: dict,
                  ftabs=None) -> dict:
        loss, (_, logp, out_lens) = self._loss_fn(
            state.params, state.batch_stats, batch,
            jax.random.PRNGKey(0), False, ftabs)
        toks, tok_lens = greedy_decode(logp, out_lens)
        return {"loss": loss, "tokens": toks, "token_lens": tok_lens}

    # ---- epoch loop ----

    def ckpt_meta(self, epoch: int) -> dict:
        """Everything predict/test need to rebuild the model from a ckpt."""
        return {"epoch": epoch, "model": self.cfg.model,
                "num_classes": self.cfg.num_classes,
                "model_kwargs": self.cfg.model_kwargs,
                "feature": dataclasses.asdict(self.feat_cfg)}

    def _epoch_batches(self, train_loader: AudioLoader, epoch: int,
                       grain_state: dict | None = None):
        """Yield (n_real_utts, device_batch) for one epoch.

        With cfg.prefetch > 0 a background thread runs the host-side work
        (wav decode, pack, device_put) so batch N+1 uploads while step N
        executes — the input pipeline comes OFF the step's critical path
        (VERDICT r2 item 4). Batch order and contents are identical to the
        synchronous path (same deterministic batch_plan) in every mode.
        """
        if self._grain is None and self.cfg.device_corpus:
            dc = self._device_corpus_for(train_loader)
            if dc is not None:
                yield from dc.batches(epoch)
                return
        if self._grain is not None:
            if grain_state is not None:
                src = self._grain.set_state(grain_state)
            else:
                src = self._grain.iter_epoch(epoch)
        else:
            train_loader.epoch = epoch   # deterministic order resume
            src = iter(train_loader)
        if self.cfg.prefetch <= 0:
            for batch in src:
                yield int(batch["real"].sum()), self._device_batch(batch)
            return

        import queue
        import threading
        q: queue.Queue = queue.Queue(maxsize=self.cfg.prefetch)
        err: list[BaseException] = []

        def work():
            try:
                for batch in src:
                    q.put((int(batch["real"].sum()),
                           self._device_batch(batch)))
            except BaseException as e:    # surfaced on the main thread
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=work, daemon=True,
                             name="tpuasr-prefetch")
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            if err:
                raise err[0]
        finally:
            t.join(timeout=5.0)

    def fit(self, train_loader: AudioLoader, dev_loader: AudioLoader = None,
            metrics_dir: str = None) -> TrainState:
        cfg = self.cfg
        writer = MetricsWriter(metrics_dir) if metrics_dir else None
        self._grain = None
        if cfg.use_grain:
            from tpuasr.data.grain_pipeline import GrainAudioPipeline
            self._grain = GrainAudioPipeline(train_loader,
                                             num_workers=cfg.grain_workers,
                                             prefetch=max(cfg.prefetch, 1))
        # Initialize (or resume) from a template batch before the epoch loop.
        init_batch = train_loader.make_batch(train_loader.batch_plan(0)[0])
        state = self.init_state(init_batch)
        self.log.info("model %s: %.2fM params", cfg.model,
                      self.num_params(state) / 1e6)
        start_epoch = 0
        grain_state = None
        if cfg.continue_from:
            state, meta = restore_checkpoint(cfg.continue_from,
                                             jax.device_get(state))
            state = jax.device_put(state, replicated_sharding(self.mesh))
            start_epoch = meta.get("epoch", 0)
            if self._grain is not None and meta.get("grain_state"):
                grain_state = meta["grain_state"]   # mid-epoch exact resume
            self.log.info("resumed from %s (step %d, epoch %d)",
                          cfg.continue_from, int(state.step), start_epoch)
        # Host-side step counter: int(state.step) per step is a device sync
        # on the critical path (round-2 measured ~25 ms per sync under the
        # axon tunnel); the host count tracks it exactly.
        step_h = int(state.step)
        for epoch in range(start_epoch, cfg.num_epochs):
            t_epoch = time.perf_counter()
            n_utts = 0
            for n_real, dbatch in self._epoch_batches(train_loader, epoch,
                                                      grain_state):
                grain_state = None
                state, m = self.train_step(state, dbatch,
                                           self.feat_tables)
                n_utts += n_real
                step_h += 1
                if step_h % cfg.log_every == 0:
                    loss = float(m["loss"])   # sync only at log points
                    self.log.info("epoch %d step %d loss %.4f gnorm %.3f",
                                  epoch, step_h, loss, float(m["grad_norm"]))
                    if writer:
                        writer.scalar("train/loss", loss, step_h)
                if cfg.ckpt_dir and step_h % cfg.ckpt_every_steps == 0:
                    meta = self.ckpt_meta(epoch)
                    if self._grain is not None:
                        meta["grain_state"] = self._grain.get_state()
                    save_checkpoint(cfg.ckpt_dir, jax.device_get(state),
                                    step_h, meta=meta)
            dt = time.perf_counter() - t_epoch
            self.log.info("epoch %d done in %.1fs (%.1f utt/s)", epoch, dt,
                          n_utts / max(dt, 1e-9))
            if dev_loader is not None:
                dev = self.evaluate(state, dev_loader)
                self.log.info("epoch %d dev loss %.4f ter %.4f", epoch,
                              dev["loss"], dev["ter"])
                if writer:
                    writer.scalar("dev/loss", dev["loss"], int(state.step))
                    writer.scalar("dev/ter", dev["ter"], int(state.step))
        if cfg.ckpt_dir and state is not None:
            save_checkpoint(cfg.ckpt_dir, jax.device_get(state),
                            int(state.step), meta=self.ckpt_meta(cfg.num_epochs))
        if writer:
            writer.close()
        return state

    def evaluate(self, state: TrainState, loader: AudioLoader) -> dict:
        tot_loss, n = 0.0, 0
        refs, hyps = [], []
        for batch in loader:
            out = self.eval_step(state, self._device_batch(batch),
                                 self.feat_tables)
            real = batch["real"]
            w = real.sum()
            tot_loss += float(out["loss"]) * w
            n += w
            toks = np.asarray(out["tokens"])
            tlens = np.asarray(out["token_lens"])
            for j in range(len(real)):
                if not real[j]:
                    continue
                refs.append(batch["tokens"][j][:batch["token_lens"][j]]
                            .tolist())
                hyps.append(toks[j][:tlens[j]].tolist())
        return {"loss": tot_loss / max(n, 1), "ter": wer(refs, hyps)}

    def _device_batch(self, batch: dict) -> dict:
        db = {k: v for k, v in batch.items() if k != "ids"}
        return shard_batch(db, self.mesh)
