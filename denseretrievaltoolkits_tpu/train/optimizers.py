"""Optimizer factory over optax.

Covers the reference optimizer menu (``DRT/trainer/trainer.py:75-84``):
adam / adamw / sgd / adagrad / rmsprop / adafactor, with per-name kwargs and
an optional schedule composed in (replacing the reference's optimizer-wrapping
scheduler objects, ``scheduler.py:24-62``).
"""

from __future__ import annotations

import logging
from typing import Callable, Union

import optax

from .schedulers import get_schedule

logger = logging.getLogger(__name__)

_FACTORIES = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "adagrad": optax.adagrad,
    "rmsprop": optax.rmsprop,
    "adafactor": optax.adafactor,
}


def get_optimizer(training_args) -> optax.GradientTransformation:
    name = training_args.optimizer
    factory = _FACTORIES.get(name, optax.adamw)
    if name not in _FACTORIES:
        logger.warning("Unknown optimizer %r; defaulting to adamw", name)

    lr: Union[float, Callable] = get_schedule(
        training_args.scheduler,
        training_args.learning_rate,
        training_args.scheduler_kwargs,
    )
    kwargs = dict(training_args.optimizer_kwargs)
    if name == "adafactor":
        kwargs.update(training_args.adafactor_kwargs)
    return factory(learning_rate=lr, **kwargs)
