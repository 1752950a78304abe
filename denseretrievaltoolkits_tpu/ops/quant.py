"""On-device int8 quantization kernels.

Replaces the host-side numpy quantization in index/flat.py for the
encode-into-index path: embeddings produced on device are quantized on device
(per-row symmetric absmax scales) without a host round trip — the int8 HBM
index is what makes 21M-passage corpora fit (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_kernel(x_ref, values_ref, scales_ref):
    x = x_ref[:].astype(jnp.float32)  # [TB, H]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    values_ref[:] = q.astype(jnp.int8)
    scales_ref[:] = scale  # [TB, 1]


@functools.partial(jax.jit, static_argnames=("block_rows",))
def quantize_int8_device(
    reps: jax.Array, block_rows: int = 1024
) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization on device.

    reps [N, H] float → (values [N, H] int8, scales [N] fp32)."""
    N, H = reps.shape
    pad = (-N) % block_rows
    x = jnp.pad(reps, ((0, pad), (0, 0))) if pad else reps
    n_blocks = x.shape[0] // block_rows
    values, scales = pl.pallas_call(
        _quantize_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, H), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((block_rows, H), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], H), jnp.int8),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return values[:N], scales[:N, 0]


def dequantize_int8(values: jax.Array, scales: jax.Array) -> jax.Array:
    """values [N, H] int8, scales [N] → fp32 reps (for parity checks)."""
    return values.astype(jnp.float32) * scales[:, None]


def _quantize4_kernel(x_ref, values_ref, scales_ref, *, half: int):
    """Per-row symmetric int4: codes in [-7, 7], scale = absmax/7. The two
    nibbles of each output byte hold feature dims split by COLUMN HALVES
    (low nibble: dims [0, H/2), high nibble: dims [H/2, H)) — the unpack in
    the search kernel is then two sign-extends + two matmuls, no interleave."""
    x = x_ref[:].astype(jnp.float32)  # [TB, H]
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(x / scale), -7, 7).astype(jnp.int32)
    lo = q[:, :half] & 0xF
    hi = q[:, half:] & 0xF
    values_ref[:] = (lo | (hi << 4)).astype(jnp.int8)
    scales_ref[:] = scale


@functools.partial(jax.jit, static_argnames=("block_rows",))
def quantize_int4_device(
    reps: jax.Array, block_rows: int = 1024
) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int4 quantization on device.

    reps [N, H] float (H even) → (packed [N, H/2] int8, scales [N] fp32).
    Half the HBM of int8: a 21M x 768 corpus fits one chip (~8 GB)."""
    N, H = reps.shape
    assert H % 2 == 0, "int4 packing needs an even feature dim"
    pad = (-N) % block_rows
    x = jnp.pad(reps, ((0, pad), (0, 0))) if pad else reps
    n_blocks = x.shape[0] // block_rows
    values, scales = pl.pallas_call(
        functools.partial(_quantize4_kernel, half=H // 2),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, H), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((block_rows, H // 2), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], H // 2), jnp.int8),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return values[:N], scales[:N, 0]


def dequantize_int4(values: jax.Array, scales: jax.Array) -> jax.Array:
    """packed [N, H/2] int8, scales [N] → fp32 reps [N, H] (parity checks)."""
    x = values.astype(jnp.int32)
    lo = (x << 28) >> 28   # sign-extended low nibble
    hi = (x << 24) >> 28   # sign-extended high nibble
    full = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)
    return full * scales[:, None]
