"""Pallas fused in-batch contrastive loss (similarity + CE in one kernel).

The training-loss hot path: scores = q·pᵀ with stride targets and softmax CE
(reference ``biencoder.py:107-116``).  The fused kernel computes, per query
tile, the MXU score block, a numerically-stable log-sum-exp, and the target
score — the [Q, P] score matrix never reaches HBM.  The custom backward
recomputes the tile's scores and emits dq / dp contributions on the MXU in
the same kernel (activation-free, FlashAttention-style).

The passage matrix must fit VMEM (P·H bf16 ≤ ~6 MB, e.g. P ≤ 4096 at H 768);
``fused_contrastive_loss`` falls back to the XLA formulation beyond that or
off-TPU.  Opt in via ``DRModelSpec(fused_loss=True)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..train.losses import contrastive_loss as xla_contrastive_loss

QT = 128  # query tile


def _fwd_kernel(q_ref, p_ref, lse_ref, tgt_ref, *, stride: int, qt: int):
    """Per query tile: scores on MXU → log-sum-exp + target score rows."""
    i = pl.program_id(0)
    q = q_ref[:]
    p = p_ref[:]
    s = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qt, P]
    m = jnp.max(s, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True)) + m
    lse_ref[:] = lse
    # target column for global row r = (i*qt + row): r * stride
    rows = jax.lax.broadcasted_iota(jnp.int32, (qt, s.shape[1]), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, s.shape[1]), 1)
    target_col = (i * qt + rows) * stride
    tgt_ref[:] = jnp.sum(jnp.where(cols == target_col, s, 0.0), axis=1,
                         keepdims=True)


def _bwd_kernel(q_ref, p_ref, lse_ref, out_dq_ref, out_dp_ref, *,
                stride: int, qt: int, n_q: int):
    """Recompute tile scores; dq = (softmax − onehot)ᵀ-weighted p, dp likewise."""
    i = pl.program_id(0)
    q = q_ref[:]
    p = p_ref[:]
    s = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    soft = jnp.exp(s - lse_ref[:])  # softmax rows via stored lse
    rows = jax.lax.broadcasted_iota(jnp.int32, soft.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, soft.shape, 1)
    target_col = (i * qt + rows) * stride
    g = (soft - jnp.where(cols == target_col, 1.0, 0.0)) / n_q  # dL/ds, mean CE
    out_dq_ref[:] = jax.lax.dot_general(
        g, p.astype(jnp.float32), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp_tile = jax.lax.dot_general(
        g, q.astype(jnp.float32), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, H]
    # accumulate across query tiles (constant index_map → same output block)
    @pl.when(i == 0)
    def _():
        out_dp_ref[:] = dp_tile

    @pl.when(i != 0)
    def _():
        out_dp_ref[:] = out_dp_ref[:] + dp_tile


def _pad_q(q, qt):
    pad = (-q.shape[0]) % qt
    return (jnp.pad(q, ((0, pad), (0, 0))), pad) if pad else (q, 0)


@functools.partial(jax.jit, static_argnames=("stride",))
def _fused_fwd(q, p, stride):
    Q0, H = q.shape
    P = p.shape[0]
    qp, _ = _pad_q(q, min(QT, max(8, Q0)))
    qt = min(QT, max(8, Q0))
    n_tiles = qp.shape[0] // qt
    interpret = jax.default_backend() != "tpu"
    lse, tgt = pl.pallas_call(
        functools.partial(_fwd_kernel, stride=stride, qt=qt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
        ),
        interpret=interpret,
    )(qp, p)
    loss = jnp.mean(lse[:Q0, 0] - tgt[:Q0, 0])
    return loss, lse


@functools.partial(jax.jit, static_argnames=("stride",))
def _fused_bwd(q, p, lse, stride):
    Q0, H = q.shape
    P = p.shape[0]
    qt = min(QT, max(8, Q0))
    qp, padn = _pad_q(q, qt)
    if padn:
        # padded rows: give them a huge lse so softmax≈0 → no gradient, and
        # their one-hot column is out of range (target col ≥ P) → no -1 term
        lse = jnp.concatenate([lse[: qp.shape[0] - padn],
                               jnp.full((padn, 1), 1e30, jnp.float32)])
    n_tiles = qp.shape[0] // qt
    interpret = jax.default_backend() != "tpu"
    dq, dp = pl.pallas_call(
        functools.partial(_bwd_kernel, stride=stride, qt=qt, n_q=Q0),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((qt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp.shape[0], H), jnp.float32),
            jax.ShapeDtypeStruct((P, H), jnp.float32),
        ),
        interpret=interpret,
    )(qp, p, lse)
    return dq[:Q0], dp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_contrastive_loss(q_reps: jax.Array, p_reps: jax.Array, stride: int):
    loss, _ = _fused_fwd(q_reps, p_reps, stride)
    return loss


def _vjp_fwd(q_reps, p_reps, stride):
    loss, lse = _fused_fwd(q_reps, p_reps, stride)
    return loss, (q_reps, p_reps, lse)


def _vjp_bwd(stride, residuals, g):
    q_reps, p_reps, lse = residuals
    dq, dp = _fused_bwd(q_reps, p_reps, lse, stride)
    return g * dq, g * dp


fused_contrastive_loss.defvjp(_vjp_fwd, _vjp_bwd)

# VMEM budget: p (P·H fp32) + scores tile; cap where the fused kernel applies
MAX_FUSED_ELEMS = 4096 * 768


def contrastive_loss_auto(q_reps, p_reps) -> Tuple[jax.Array, jax.Array]:
    """Fused kernel when shapes fit; XLA otherwise. Returns (loss, scores) —
    scores are only materialized on the XLA path (None on the fused path)."""
    Q, H = q_reps.shape
    P = p_reps.shape[0]
    if P * H <= MAX_FUSED_ELEMS and P % Q == 0:
        stride = P // Q
        loss = fused_contrastive_loss(
            q_reps.astype(jnp.float32), p_reps.astype(jnp.float32), stride
        )
        return loss, None
    return xla_contrastive_loss(q_reps, p_reps)
