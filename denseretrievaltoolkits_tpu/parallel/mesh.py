"""Device mesh + sharding rules (replaces NCCL DDP / negatives_x_device).

The reference's distributed story (SURVEY.md §2): DDP gradient all-reduce
(``trainer.py:63``), embedding all_gather for global in-batch negatives
(``biencoder.py:243-254``), and rank-synchronization barriers.  On TPU all of
it is sharding annotations over one ``Mesh``:

- mesh axes ``("data", "model")``: batch sharded over ``data`` (dp), weight
  matrices optionally Megatron-sharded over ``model`` (tp);
- the train step is ONE jitted function; XLA inserts the gradient psum and the
  p_reps all_gather for the global contrastive score matrix automatically from
  the shardings (negatives_x_device is the default by construction);
- collectives ride ICI; there are no barriers and no filesystem exchanges.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp_size: int = -1, tp_size: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp_size == -1:
        dp_size = n // tp_size
    if dp_size * tp_size != n:
        devices = devices[: dp_size * tp_size]
    dev_array = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------------
# Parameter sharding rules (Megatron-style tensor parallelism over MODEL_AXIS)
# ---------------------------------------------------------------------------

# leaf-name → PartitionSpec, for the stacked-layer BERT pytree (models/bert.py).
# qkv and wi shard their OUTPUT features (column parallel); o and wo shard
# their INPUT features (row parallel) so the pair needs a single psum that
# GSPMD inserts at the block boundary.
_LAYER_RULES = {
    "q_kernel": P(None, None, MODEL_AXIS),
    "k_kernel": P(None, None, MODEL_AXIS),
    "v_kernel": P(None, None, MODEL_AXIS),
    "q_bias": P(None, MODEL_AXIS),
    "k_bias": P(None, MODEL_AXIS),
    "v_bias": P(None, MODEL_AXIS),
    "o_kernel": P(None, MODEL_AXIS, None),
    "wi_kernel": P(None, None, MODEL_AXIS),
    "wi_bias": P(None, MODEL_AXIS),
    "wo_kernel": P(None, MODEL_AXIS, None),
}


def param_pspec(path: Tuple, leaf) -> P:
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return _LAYER_RULES.get(name, P())


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per the TP rules (replicated over
    the data axis).  Multi-host: every process holds the full host copy, so
    each addressable device pulls its slice via make_array_from_callback."""
    multi = jax.process_count() > 1

    def place(path, leaf):
        sharding = NamedSharding(mesh, param_pspec(path, leaf))
        if multi:
            leaf = np.asarray(leaf)
            return jax.make_array_from_callback(
                leaf.shape, sharding, lambda idx, _leaf=leaf: _leaf[idx])
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def make_put_batch(mesh: Mesh) -> Callable:
    """Batch placement onto the mesh's data axis, multi-host aware.

    Single-host: one ``device_put`` per leaf.  Multi-host: each process holds
    only ITS slice of the global batch (the loaders' strided equal-length
    shard), so assembly goes through ``make_array_from_process_local_data`` —
    a metadata-only construction, no cross-host data movement."""
    bsh = batch_sharding(mesh)

    def put_batch(batch):
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    bsh, np.asarray(x)),
                batch,
            )
        return jax.tree.map(lambda x: jax.device_put(np.asarray(x), bsh), batch)

    return put_batch


def shard_state(state: Dict[str, Any], optimizer, mesh: Mesh) -> Dict[str, Any]:
    """Shard params per TP rules, then re-init opt_state from the sharded
    params so its moments inherit the same placement."""
    params = shard_params(state["params"], mesh)
    opt_state = optimizer.init(params)
    return {"params": params, "opt_state": opt_state}


def shard_steps(
    train_step: Callable,
    encode_query: Callable,
    encode_passage: Callable,
    mesh: Mesh,
    state: Dict[str, Any],
    encode_shard_map: bool = False,
) -> Tuple[Callable, Callable, Callable]:
    """pjit the three step functions over the mesh.

    The caller's ``state`` is re-placed in-place-by-reference semantics: the
    returned train step expects (and preserves) the sharded layout; batches are
    device_put to the data axis on entry.

    ``encode_shard_map``: wrap the two encode fns in ``shard_map`` over the
    data axis (params replicated, batch row-sharded).  GSPMD has no
    partitioning rule for ``pallas_call``, so attention='fused' under plain
    pjit would all-gather the batch and run the kernel replicated on every
    device; the shard_map body instead runs it on each device's local rows —
    this is what makes the fused encoder multi-chip.  Only taken on dp-only
    meshes (tp shards the weight matrices, which the per-device kernel body
    would then have to re-gather); tp>1 falls back to plain pjit.
    """
    train_jit = jax.jit(train_step, donate_argnums=(0,))
    # encode outputs PINNED to the data axis: each host's devices then hold
    # exactly the rows of ITS input slice, so Trainer._local_rows can extract
    # the host-local block (multi-host evaluate/corpus-encode; without the
    # constraint XLA may replicate the output and every host would see the
    # GLOBAL batch, duplicating other hosts' corpus rows)
    rep_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    if encode_shard_map and mesh.shape[MODEL_AXIS] == 1:
        from jax.experimental.shard_map import shard_map

        def smap(fn):
            return shard_map(
                fn, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS, None)),
                out_specs=P(DATA_AXIS, None),
                check_rep=False)

        encode_query = smap(encode_query)
        encode_passage = smap(encode_passage)
    encq_jit = jax.jit(encode_query, out_shardings=rep_sharding)
    encp_jit = jax.jit(encode_passage, out_shardings=rep_sharding)
    put_batch = make_put_batch(mesh)

    def wrapped_train(state, batch):
        return train_jit(state, put_batch(batch))

    def wrapped_encq(params, batch):
        return encq_jit(params, put_batch(batch))

    def wrapped_encp(params, batch):
        return encp_jit(params, put_batch(batch))

    return wrapped_train, wrapped_encq, wrapped_encp
