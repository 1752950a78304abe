"""Pooling and normalization over encoder hidden states.

Semantics match the reference exactly: CLS / masked-mean / masked-max pooling
(``DRT/model/biencoder.py:139-146``, ``DRT/model/utils.py:233-240``) and
optional L2 normalization (``biencoder.py:149-150``).
"""

from __future__ import annotations

import jax.numpy as jnp


def pool(hidden: jnp.ndarray, attention_mask: jnp.ndarray, method: str = "first") -> jnp.ndarray:
    """Pool [B, S, H] hidden states to [B, H]."""
    if method == "first":
        return hidden[:, 0, :]
    mask = attention_mask.astype(hidden.dtype)[:, :, None]
    if method == "mean":
        summed = jnp.sum(hidden * mask, axis=1)
        count = jnp.clip(jnp.sum(mask, axis=1), min=1e-9)
        return summed / count
    if method == "max":
        # Reference max_pooling multiplies by the mask (zeroing padded positions)
        # rather than masking with -inf (DRT/model/utils.py:238-240).
        return jnp.max(hidden * mask, axis=1)
    raise ValueError(f"Unknown pooling type: {method}")


def l2_normalize(reps: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(reps, axis=-1, keepdims=True)
    return reps / jnp.clip(norm, min=eps)
