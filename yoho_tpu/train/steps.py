"""Jittable train/val steps for PartI and PartII (optax).

Replaces the reference trainers' inner loops
(``/root/reference/train/trainer.py:87-138,210-265``): Adam with
step-wise exponential LR decay (``utils/utils.py:158-165``), loss from
``train/losses.py``. Steps are pure functions of (state, batch) so they
jit/pjit directly; the host-side Trainer (checkpointing, validation
cadence) lives in ``train/trainer.py``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from yoho_tpu.config import TrainConfig
from yoho_tpu.train.losses import batch_hard_rindex_loss, smooth_l1_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """lr(step) = lr_init * decay_rate**(step / (steps_per_epoch*decay_step))
    — continuous exponential decay, reference ``ExpDecayLR``."""
    return optax.exponential_decay(
        init_value=cfg.lr_init,
        transition_steps=max(1, int(steps_per_epoch * cfg.lr_decay_step)),
        decay_rate=cfg.lr_decay_rate,
        staircase=False,
    )


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam (reference trainer.py:47), or AdamW when cfg.weight_decay > 0
    (overfit control; note the opt_state pytree differs between the two,
    so checkpoints don't resume across a weight_decay on/off change)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = getattr(cfg, "weight_decay", 0.0)
    if wd:
        return optax.adamw(schedule, weight_decay=wd)
    return optax.adam(schedule)


def init_train_state(variables, optimizer) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def part1_train_step(
    model,
    optimizer,
    cfg: TrainConfig,
    state: TrainState,
    batch: dict,
) -> tuple[TrainState, dict]:
    """One PartI step. batch: feats0/feats1 (B, 60, 32), true_idx (B,).

    The two descriptor towers share parameters; we run them as one
    concatenated batch (the reference runs them sequentially through
    the same module, ``utils/network.py:124-125`` — same math, and BN
    sees the union batch instead of two half-batches).
    """

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        feats = jnp.concatenate([batch["feats0"], batch["feats1"]], axis=0)
        out, mutated = model.apply(
            variables, feats, True, mutable=["batch_stats"]
        )
        B = batch["feats0"].shape[0]
        inv0, inv1 = out["inv"][:B], out["inv"][B:]
        eqv0, eqv1 = out["eqv"][:B], out["eqv"][B:]
        total, aux = batch_hard_rindex_loss(
            inv0,
            inv1,
            eqv0,
            eqv1,
            batch["true_idx"],
            margin=cfg.loss_margin,
            inv_weight=cfg.inv_loss_weight,
        )
        return total, (aux, mutated["batch_stats"])

    (loss, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
    metrics = {"loss": loss, **aux}
    return new_state, metrics


def part2_train_step(
    model,
    optimizer,
    cfg: TrainConfig,
    state: TrainState,
    batch: dict,
) -> tuple[TrainState, dict]:
    """One PartII step. batch: before_eqv0/1, after_eqv0/1 (B, 60, 32)
    (all PartI outputs, frozen upstream), true_idx (B,), delta_q (B, 4).

    Train path does NOT normalize the quaternion (reference quirk,
    ``utils/network.py:211``)."""

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        q, mutated = model.apply(
            variables,
            batch["before_eqv0"],
            batch["before_eqv1"],
            batch["after_eqv0"],
            batch["after_eqv1"],
            batch["true_idx"],
            True,
            normalize=False,
            mutable=["batch_stats"],
        )
        loss = smooth_l1_loss(q, batch["delta_q"])
        return loss, mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(new_params, new_stats, new_opt, state.step + 1)
    return new_state, {"loss": loss}
