"""Jitted train/val steps + optimizer construction.

Recipe parity with the reference (train.py:98,124-127,213):
  Adam(lr, betas=(0.9, 0.999), weight_decay=wd), global-norm grad clip
  2.0 applied BEFORE the optimizer update, MultiStep LR halving at the
  `--lrepochs` milestones (lr is injected per step via
  optax.inject_hyperparams so resume restores it exactly).

Data parallelism: steps are jitted with the batch sharded over the
mesh's data axis and state replicated — GSPMD inserts the gradient
psum over ICI. Single-device keeps the same code path (trivial mesh).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from itermvs_tpu.models.losses import full_loss
from itermvs_tpu.engine.metrics import depth_metrics
from itermvs_tpu.parallel.mesh import batch_sharding, replicate


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def parse_lrepochs(lrepochs: str):
    """'4,8,12:2' → (milestone epochs [4,8,12], gamma 1/2)."""
    milestones_str, rate_str = lrepochs.split(":")
    milestones = [int(e) for e in milestones_str.split(",")]
    return milestones, 1.0 / float(rate_str)


def lr_for_epoch(base_lr: float, epoch: int, lrepochs: str) -> float:
    milestones, gamma = parse_lrepochs(lrepochs)
    scale = 1.0
    for m in milestones:
        if epoch >= m:
            scale *= gamma
    return base_lr * scale


def make_optimizer(wd: float = 0.0):
    """Clip(2.0) → Adam; lr injected per call (set via hyperparams)."""
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(2.0),
            optax.add_decayed_weights(wd) if wd > 0 else optax.identity(),
            optax.adam(learning_rate, b1=0.9, b2=0.999),
        )
    )(learning_rate=1e-3)
    return tx


def create_train_state(variables, tx) -> TrainState:
    # Copy leaves: the jitted step donates its input state, and the
    # caller's `variables` must survive repeated state creation.
    params = jax.tree.map(jnp.array, variables["params"])
    batch_stats = jax.tree.map(jnp.array, variables["batch_stats"])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(model, tx, regress: bool, num_iters: int, mesh=None):
    """Returns step(state, batch, lr) → (state, scalars dict)."""

    def step_fn(state: TrainState, batch, lr):
        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["imgs"], batch["proj_matrices"],
                batch["depth_min"], batch["depth_max"],
                train=True, mutable=["batch_stats"],
            )
            loss = full_loss(outputs, batch["depth"], batch["mask"],
                             batch["depth_min"], batch["depth_max"], regress)
            return loss, (mutated["batch_stats"], outputs)

        (loss, (batch_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state)

        scalars = {"loss": loss}
        scalars.update(depth_metrics(
            outputs["depths"]["combine"], outputs["depths_upsampled"][0],
            batch["depth"], batch["mask"], num_iters))
        return new_state, scalars

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    state_s = replicate(mesh)
    batch_s = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_s, batch_s, state_s),
        out_shardings=(state_s, state_s),
        donate_argnums=(0,),
    )


def make_val_step(model, regress: bool, num_iters: int, mesh=None):
    """Validation: loss + metrics, no gradient, BN in eval mode."""

    def step_fn(params, batch_stats, batch):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["imgs"], batch["proj_matrices"],
            batch["depth_min"], batch["depth_max"], train=False,
        )
        loss = full_loss(outputs, batch["depth"], batch["mask"],
                         batch["depth_min"], batch["depth_max"], regress)
        scalars = {"loss": loss}
        scalars.update(depth_metrics(
            outputs["depths"]["combine"], outputs["depths_upsampled"][0],
            batch["depth"], batch["mask"], num_iters))
        return scalars

    if mesh is None:
        return jax.jit(step_fn)
    state_s = replicate(mesh)
    batch_s = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(state_s, state_s, batch_s),
                   out_shardings=state_s)
