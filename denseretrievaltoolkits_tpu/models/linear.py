"""Bias-free linear projection head.

Functional equivalent of the reference's ``LinearHead`` (``DRT/model/linear.py:12-39``):
a single no-bias Linear with a JSON config + weight file save/load layout.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

HEAD_WEIGHTS = "linear.npz"
HEAD_CONFIG = "head_config.json"


def init_head(rng: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> Dict:
    kernel = jax.random.normal(rng, (in_dim, out_dim)) * (in_dim ** -0.5)
    return {"kernel": kernel.astype(dtype)}


def apply_head(head_params: Dict, reps: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(reps, head_params["kernel"].astype(reps.dtype),
                   preferred_element_type=reps.dtype)


def save_head(head_params: Dict, ckpt_dir: str) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    kernel = np.asarray(head_params["kernel"])
    np.savez(os.path.join(ckpt_dir, HEAD_WEIGHTS), kernel=kernel)
    with open(os.path.join(ckpt_dir, HEAD_CONFIG), "w") as fh:
        json.dump({"input_dim": int(kernel.shape[0]), "output_dim": int(kernel.shape[1])}, fh, indent=4)


def load_head(ckpt_dir: str) -> Dict:
    with np.load(os.path.join(ckpt_dir, HEAD_WEIGHTS)) as z:
        return {"kernel": jnp.asarray(z["kernel"])}
