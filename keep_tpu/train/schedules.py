"""LR schedules (reference training/path_training/scheduler.py:13-53 semantics,
as pure step→lr functions usable with optax.inject_hyperparams)."""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(base_lr, warmup_length, step):
    return base_lr * (step + 1) / jnp.maximum(warmup_length, 1)


def const_lr(base_lr: float, warmup_length: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), base_lr)

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup_length: int,
    steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    start_cooldown = steps - cooldown_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - start_cooldown
        es = steps - start_cooldown
        decay = (1 - e / es) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown, base_lr, cooled)
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), lr)

    return schedule


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        e = step - warmup_length
        es = steps - warmup_length
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, _warmup(base_lr, warmup_length, step), cos)

    return schedule
