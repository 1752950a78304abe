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


def get_optimizer(training_args, params=None) -> optax.GradientTransformation:
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
    opt = factory(learning_rate=lr, **kwargs)

    if params is not None:
        from ..models.lora import has_lora, lora_mask

        if has_lora(params):
            # parameter-efficient training: only the adapter (+head) leaves
            # update; the frozen base gets set_to_zero updates (optax.masked
            # would pass RAW gradients through for masked-out leaves)
            logger.info("LoRA leaves detected: freezing base parameters")

            def labels(p):
                import jax

                return jax.tree.map(
                    lambda trainable: "train" if trainable else "freeze",
                    lora_mask(p),
                )

            opt = optax.multi_transform(
                {"train": opt, "freeze": optax.set_to_zero()}, labels
            )
    return opt
