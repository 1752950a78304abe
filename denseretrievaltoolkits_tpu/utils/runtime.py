"""Runtime setup shared by the entry points."""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def setup_runtime(training_args) -> None:
    """Persistent XLA compilation cache + distributed init.

    First compiles of the 12-layer towers cost 10-100 s (more through a
    relayed TPU); the persistent cache makes re-runs and resumed jobs skip
    them entirely.
    """
    import jax

    cache_dir = os.path.join(training_args.cache_train_dir, "jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # older jax or read-only fs — not fatal
        logger.debug("compilation cache disabled: %s", exc)

    from .distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
