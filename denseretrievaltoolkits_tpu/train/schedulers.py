"""Learning-rate schedules as optax schedule functions.

The reference wraps the optimizer in scheduler objects that recompute lr each
``step()`` (``DRT/trainer/scheduler.py:24-133``).  In optax a schedule is a pure
``step -> lr`` function composed into the gradient transformation — same four
schedules (inverse-sqrt / cosine / linear / constant), all with linear warmup,
and numerically identical to the reference formulas at every step.

Reference formulas (n = step count, starting at 1 on the first update):
- warmup (all): init_lr + (max_lr - init_lr) / n_warmup_steps * n   for n <= warmup
- inverse  (:65-79):  max_lr * sqrt(n_warmup_steps) * n**-0.5
- cosine   (:82-97):  init_lr + (max_lr-init_lr)/2 * (1 + cos(pi*(n-w)/(max_steps-w)))
- linear   (:100-116): max_lr - (max_lr-init_lr)/(max_steps-w) * (n-w)
- constant (:119-133): max_lr
"""

from __future__ import annotations

import jax.numpy as jnp


def _warmup(step, init_lr, max_lr, n_warmup_steps):
    return init_lr + (max_lr - init_lr) / n_warmup_steps * step


def inverse_sqrt_schedule(init_lr: float, max_lr: float, n_warmup_steps: int):
    decay_k = max_lr * (n_warmup_steps ** 0.5)

    def schedule(step):
        step = jnp.maximum(step, 1)
        return jnp.where(
            step <= n_warmup_steps,
            _warmup(step, init_lr, max_lr, n_warmup_steps),
            decay_k * step ** -0.5,
        )

    return schedule


def cosine_schedule(init_lr: float, max_lr: float, n_warmup_steps: int, max_steps: int):
    half_delta = (max_lr - init_lr) / 2
    decay_k = jnp.pi / (max_steps - n_warmup_steps)

    def schedule(step):
        step = jnp.maximum(step, 1)
        return jnp.where(
            step <= n_warmup_steps,
            _warmup(step, init_lr, max_lr, n_warmup_steps),
            init_lr + half_delta * (1.0 + jnp.cos(decay_k * (step - n_warmup_steps))),
        )

    return schedule


def linear_schedule(init_lr: float, max_lr: float, n_warmup_steps: int, max_steps: int):
    decay_k = (max_lr - init_lr) / (max_steps - n_warmup_steps)

    def schedule(step):
        step = jnp.maximum(step, 1)
        return jnp.where(
            step <= n_warmup_steps,
            _warmup(step, init_lr, max_lr, n_warmup_steps),
            max_lr - decay_k * (step - n_warmup_steps),
        )

    return schedule


def constant_schedule(init_lr: float, max_lr: float, n_warmup_steps: int):
    def schedule(step):
        step = jnp.maximum(step, 1)
        return jnp.where(
            step <= n_warmup_steps,
            _warmup(step, init_lr, max_lr, n_warmup_steps),
            max_lr,
        )

    return schedule


SCHEDULES = {
    "inverse": inverse_sqrt_schedule,
    "cosine": cosine_schedule,
    "linear": linear_schedule,
    "constant": constant_schedule,
}


def get_schedule(name: str, learning_rate: float, scheduler_kwargs: dict):
    """Build a schedule by name, defaulting max_lr to the base learning rate
    (mirrors ``trainer.py:111`` scheduler_kwargs.setdefault('max_lr', lr))."""
    if name is None:
        return learning_rate
    if name not in SCHEDULES:
        raise ValueError(f"Unknown scheduler {name!r}; choose from {sorted(SCHEDULES)}")
    kwargs = dict(scheduler_kwargs)
    kwargs.setdefault("max_lr", learning_rate)
    kwargs.setdefault("init_lr", 0.0)
    return SCHEDULES[name](**kwargs)
