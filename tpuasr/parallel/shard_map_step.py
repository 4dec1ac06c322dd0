"""Explicit shard_map data-parallel train step.

The default Trainer path relies on jit + NamedShardings, letting XLA's SPMD
partitioner place the gradient all-reduce. This module is the EXPLICIT
formulation (SURVEY.md section 7.1 step 7: "shard_map over a data mesh
axis, ICI all-reduce"): the per-shard computation is written against local
shapes and the cross-device `jax.lax.pmean` over the "data" axis is placed
by hand — the TPU-native analogue of a hand-written NCCL all-reduce, except
it is one line and the compiler schedules it on ICI.

Semantically identical to Trainer.train_step (tests assert loss equality);
useful as the template when per-shard logic must diverge (e.g. local loss
scaling, grad accumulation with per-shard skipping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpuasr.parallel.mesh import DATA_AXIS


def make_shard_map_train_step(trainer):
    """Builds a shard_map'd train step bound to a Trainer's model/loss/opt.

    Returns step(state, batch) -> (state, metrics); batch arrays must have a
    leading batch dim divisible by the mesh's data-axis size.

    BatchNorm: models exposing `axis_name` (DeepSpeechCTC) are cloned with
    axis_name="data" so batch statistics sync across shards (exactly
    matching the jit path's global-batch stats); models without it compute
    per-shard statistics here.
    """
    import copy

    mesh = trainer.mesh
    if getattr(trainer.model, "axis_name", None) != DATA_AXIS and \
            hasattr(trainer.model, "axis_name"):
        trainer = copy.copy(trainer)
        trainer.model = trainer.model.clone(axis_name=DATA_AXIS)

    def per_shard(params, batch_stats, opt_state, step_no, batch):
        # Everything in here sees LOCAL (per-device) batch shapes.
        rng = jax.random.fold_in(
            jax.random.PRNGKey(trainer.cfg.seed + 1), step_no)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def shard_loss(params, batch_stats, batch, rng):
            # _loss_fn returns the LOCAL weighted mean; re-normalize by the
            # GLOBAL weight so shards with repeat-padded rows (real=False)
            # don't dilute the loss — global = psum of these parts.
            mean, aux = trainer._loss_fn(params, batch_stats, batch, rng,
                                         True)
            w = jnp.sum(batch["real"].astype(jnp.float32))
            W = jax.lax.psum(w, DATA_AXIS)
            return mean * w / jnp.maximum(W, 1.0), aux

        (loss_part, (new_stats, _, _)), grads = jax.value_and_grad(
            shard_loss, has_aux=True)(params, batch_stats, batch, rng)
        # The explicit ICI collectives: the global loss/grads are SUMS of
        # the globally-normalized per-shard parts.
        loss = jax.lax.psum(loss_part, DATA_AXIS)
        grads = jax.lax.psum(grads, DATA_AXIS)
        # BatchNorm running stats cross-shard average (the jit path gets
        # this via the synced axis_name stats).
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        updates, new_opt = trainer.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return new_params, new_stats, new_opt, {"loss": loss,
                                                "grad_norm": gnorm}

    batch_spec = {
        "wav": P(DATA_AXIS), "wav_lens": P(DATA_AXIS),
        "tokens": P(DATA_AXIS), "token_lens": P(DATA_AXIS),
        "real": P(DATA_AXIS),
    }

    @partial(jax.jit, donate_argnums=0)
    def step(state, batch):
        specs = {k: batch_spec.get(k, P(DATA_AXIS)) for k in batch}
        new_params, new_stats, new_opt, metrics = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), P(), P(), specs),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )(state.params, state.batch_stats, state.opt_state, state.step,
          batch)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    return step
