"""LoRA parameter-efficient fine-tuning for the BERT towers.

The reference declares ``param_efficient_method`` (``DRT/arguments.py:74-77``)
but never implements any method.  This is the real thing for the stacked-layer
BERT pytree: rank-r adapters on the attention q/v projections (the standard
LoRA placement), stored as extra stacked leaves inside ``params["layers"]`` so
they ride the same ``lax.scan``, checkpointing, and sharding machinery as the
base weights.  ``B`` initializes to zero, so the adapted model starts exactly
at the base model.

Freezing the base is an optimizer concern: ``lora_mask`` yields the boolean
pytree for ``optax.masked`` (wired in train/optimizers.py when LoRA leaves are
present).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

LORA_KEYS = ("lora_q_A", "lora_q_B", "lora_v_A", "lora_v_B")


def add_lora(lm_params: Dict[str, Any], rng: jax.Array, rank: int = 8,
             dtype=jnp.float32) -> Dict[str, Any]:
    """Return a copy of a BERT tower pytree with stacked LoRA leaves added."""
    if "encoder" in lm_params:  # T5 tower
        return add_lora_t5(lm_params, rng, rank, dtype)
    layers = lm_params["layers"]
    L, H, _ = layers["q_kernel"].shape
    k_q, k_v = jax.random.split(rng)
    std = H ** -0.5
    out = dict(lm_params)
    out["layers"] = dict(layers)
    out["layers"]["lora_q_A"] = (jax.random.normal(k_q, (L, H, rank)) * std).astype(dtype)
    out["layers"]["lora_q_B"] = jnp.zeros((L, rank, H), dtype)
    out["layers"]["lora_v_A"] = (jax.random.normal(k_v, (L, H, rank)) * std).astype(dtype)
    out["layers"]["lora_v_B"] = jnp.zeros((L, rank, H), dtype)
    return out


def add_lora_t5(lm_params: Dict[str, Any], rng: jax.Array, rank: int = 8,
                dtype=jnp.float32) -> Dict[str, Any]:
    """LoRA on the T5 ENCODER attention q/v projections ([L, D, inner])."""
    enc = lm_params["encoder"]
    L, D, I = enc["attn_q"].shape
    k_q, k_v = jax.random.split(rng)
    std = D ** -0.5
    out = dict(lm_params)
    out["encoder"] = dict(enc)
    out["encoder"]["lora_q_A"] = (jax.random.normal(k_q, (L, D, rank)) * std).astype(dtype)
    out["encoder"]["lora_q_B"] = jnp.zeros((L, rank, I), dtype)
    out["encoder"]["lora_v_A"] = (jax.random.normal(k_v, (L, D, rank)) * std).astype(dtype)
    out["encoder"]["lora_v_B"] = jnp.zeros((L, rank, I), dtype)
    return out


def has_lora(params: Dict[str, Any]) -> bool:
    def walk(node):
        if not isinstance(node, dict):
            return False
        if "lora_q_A" in node:
            return True
        return any(walk(v) for v in node.values())

    return walk(params)


def lora_mask(params: Dict[str, Any]):
    """Boolean pytree: True for trainable (LoRA + heads), False for frozen base."""

    def mask(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any(n.startswith("lora_") for n in names):
            return True
        # projection / scoring heads stay trainable alongside the adapters
        if any(n in ("head_q", "head_p", "head") for n in names):
            return True
        return False

    return jax.tree_util.tree_map_with_path(mask, params)


def merge_lora(lm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold the adapters into the base kernels (deploy-format export)."""
    layers = dict(lm_params["layers"])
    if "lora_q_A" not in layers:
        return lm_params
    layers["q_kernel"] = layers["q_kernel"] + jnp.einsum(
        "lhr,lrk->lhk", layers.pop("lora_q_A"), layers.pop("lora_q_B")
    )
    layers["v_kernel"] = layers["v_kernel"] + jnp.einsum(
        "lhr,lrk->lhk", layers.pop("lora_v_A"), layers.pop("lora_v_B")
    )
    out = dict(lm_params)
    out["layers"] = layers
    return out
