"""LR schedules (reference audiozen/optimization.py:13-30), as optax schedules."""

from __future__ import annotations

import math

import jax.numpy as jnp


def get_constant_schedule_with_warmup(base_lr: float, num_warmup_steps: int):
    """LR ramps linearly from 0 over warmup then stays at base_lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, float(num_warmup_steps))
        return base_lr * jnp.where(step < num_warmup_steps, warm, 1.0)

    return schedule


def get_linear_schedule_with_warmup(base_lr: float, num_warmup_steps: int, num_training_steps: int):
    """Linear warmup then linear decay to 0 at num_training_steps."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1.0, float(num_warmup_steps))
        decay = jnp.maximum(
            0.0,
            (num_training_steps - step) / max(1.0, float(num_training_steps - num_warmup_steps)),
        )
        return base_lr * jnp.where(step < num_warmup_steps, warm, decay)

    return schedule


def get_exponential_schedule(base_lr: float, gamma: float, steps_per_epoch: int = 1):
    """torch ExponentialLR equivalent (per-epoch gamma decay), used by the GAN
    recipes (freeze-phase run.py:33-46)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / max(1, steps_per_epoch)
        return base_lr * jnp.power(gamma, jnp.floor(epoch))

    return schedule


def get_warmup_steps(warmup_steps: int, max_steps: int, warmup_ratio: float) -> int:
    """Reference Trainer.get_warmup_steps (trainer.py:262-268)."""
    if warmup_steps > 0:
        return warmup_steps
    return math.ceil(max_steps * warmup_ratio)


def create_warmup_schedule(scheduler_name: str, base_lr: float, max_steps: int, num_warmup_steps: int):
    if scheduler_name == "constant_schedule_with_warmup":
        return get_constant_schedule_with_warmup(base_lr, num_warmup_steps)
    elif scheduler_name == "linear_schedule_with_warmup":
        return get_linear_schedule_with_warmup(base_lr, num_warmup_steps, max_steps)
    raise ValueError(f"Unknown scheduler: {scheduler_name}")
