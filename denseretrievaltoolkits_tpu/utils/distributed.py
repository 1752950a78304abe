"""Multi-host initialization (the NCCL init_process_group replacement).

The reference initializes a torch NCCL process group in every entry point
(``run_random_sampling.py:59-61``).  On TPU pods the equivalent is
``jax.distributed.initialize`` — after it, ``jax.devices()`` spans the slice,
the mesh covers every chip, and the SAME single-program scripts run per host
(each host feeds its slice of the global batch via the loaders'
``shard_num=jax.process_count(), shard_idx=jax.process_index()``).

Intra-slice collectives ride ICI; cross-slice (multi-pod) traffic rides DCN —
both are XLA's concern once the mesh is laid out, never this code's.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def maybe_initialize_distributed() -> bool:
    """Initialize JAX distributed when launched in a multi-host environment.

    Safe to call unconditionally: single-host runs are detected and skipped.
    Returns True when a multi-host runtime was initialized.
    """
    import os

    import jax

    multi_host_markers = (
        "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES",
    )
    if not any(os.environ.get(m) for m in multi_host_markers):
        return False
    try:
        jax.distributed.initialize()
        logger.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return jax.process_count() > 1
    except Exception as exc:  # single-host with stray env markers
        logger.warning("jax.distributed.initialize skipped: %s", exc)
        return False


def process_shard() -> tuple:
    """(shard_num, shard_idx) for host-side data loading on this process."""
    import jax

    return jax.process_count(), jax.process_index()


def host_corpus_bounds(
    n_rows: int,
    n_proc: int = None,
    proc_idx: int = None,
    local_shards: int = None,
) -> tuple:
    """Contiguous [start, stop) of corpus rows THIS host must encode so the
    device-sharded index assembles without host exchange.

    The global index layout is [n_shards, per, dim] with
    per = ceil(n / (n_proc * local_shards)); host h owns device shards
    [h*L, (h+1)*L), hence rows [h*L*per, min(n, (h+1)*L*per)).  The reference
    solved the same placement problem with npy dumps + a rank-0 FAISS rebuild
    (DRT/trainer/trainer.py:191-250); here the loader bound IS the placement.
    """
    import jax

    n_proc = jax.process_count() if n_proc is None else n_proc
    proc_idx = jax.process_index() if proc_idx is None else proc_idx
    local_shards = jax.local_device_count() if local_shards is None else local_shards
    per = -(-n_rows // (n_proc * local_shards))
    start = min(n_rows, proc_idx * local_shards * per)
    stop = min(n_rows, (proc_idx + 1) * local_shards * per)
    return start, stop
