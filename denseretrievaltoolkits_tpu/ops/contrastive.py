"""Pallas fused in-batch contrastive loss (similarity + CE in one kernel).

The training-loss hot path: scores = q·pᵀ with stride targets and softmax CE
(reference ``biencoder.py:107-116``).  FlashAttention-style: both queries AND
passages are tiled, the forward keeps an online (running max, running sum)
softmax accumulator in VMEM scratch across passage tiles, and the backward
recomputes score tiles — so the [Q, P] score matrix NEVER exists in HBM at
any batch size.  At gradient-cache scale (tens of thousands of reps) that
matrix is gigabytes; here peak memory is one (q_tile × p_tile) block.

Opt in via ``DRModelSpec(fused_loss=True)`` / ``--fused_loss``; grad-cache
uses it automatically for its representation-space loss when the flag is set.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..train.losses import contrastive_loss as xla_contrastive_loss

QT = 256   # query tile rows
PT = 512   # passage tile rows
NEG_BIG = -1e30


def _interp():
    return jax.default_backend() != "tpu"


# --------------------------- forward: online LSE ---------------------------


def _fwd_kernel(q_ref, p_ref, lse_ref, tgt_ref, m_scr, l_scr, t_scr, *,
                stride: int, qt: int, pt: int, n_p: int):
    qi = pl.program_id(0)
    pj = pl.program_id(1)
    n_pj = pl.num_programs(1)

    s = jax.lax.dot_general(
        q_ref[:], p_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qt, pt]
    # mask padded passage columns out of the softmax
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1) + pj * pt
    s = jnp.where(cols_g < n_p, s, NEG_BIG)

    @pl.when(pj == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr[:], NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        t_scr[:] = jnp.zeros_like(t_scr[:])

    # online log-sum-exp update
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_scr[:] = m_new

    # target score: global row r = qi*qt + row has target col r*stride;
    # it lands in this tile iff pj*pt <= col < (pj+1)*pt
    rows = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1)
    target_local = (qi * qt + rows) * stride - pj * pt
    t_scr[:] = t_scr[:] + jnp.sum(
        jnp.where(cols == target_local, s, 0.0), axis=1, keepdims=True
    )

    @pl.when(pj == n_pj - 1)
    def _():
        lse_ref[:] = jnp.log(l_scr[:]) + m_scr[:]
        tgt_ref[:] = t_scr[:]


@functools.partial(jax.jit, static_argnames=("stride", "n_q", "n_p"))
def _fused_fwd(qp, pp, stride, n_q, n_p):
    """qp [Qp, H] (query rows padded to QT), pp [Pp, H] (padded to PT);
    n_q/n_p are the REAL row counts (padding masked inside the kernel)."""
    Qp, H = qp.shape
    Pp = pp.shape[0]
    qt, pt = min(QT, Qp), min(PT, Pp)
    grid = (Qp // qt, Pp // pt)
    lse, tgt = pl.pallas_call(
        functools.partial(_fwd_kernel, stride=stride, qt=qt, pt=pt, n_p=n_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qt, H), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, H), lambda qi, pj: (pj, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qt, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((qt, 1), jnp.float32),
            pltpu.VMEM((qt, 1), jnp.float32),
            pltpu.VMEM((qt, 1), jnp.float32),
        ],
        interpret=_interp(),
    )(qp, pp)
    loss = jnp.sum(lse[:n_q, 0] - tgt[:n_q, 0]) / n_q
    return loss, lse


# ------------------------------ backward ----------------------------------
# dL/ds = (softmax(s) - onehot_target) / n_q.  Two recompute kernels:
# dq accumulates over passage tiles (inner dim), dp over query tiles.


def _bwd_dq_kernel(q_ref, p_ref, lse_ref, dq_ref, *, stride, qt, pt, n_q, n_p):
    qi = pl.program_id(0)
    pj = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], p_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1) + pj * pt
    s = jnp.where(cols_g < n_p, s, NEG_BIG)
    soft = jnp.exp(s - lse_ref[:])
    rows = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1)
    target_local = (qi * qt + rows) * stride - pj * pt
    g = (soft - jnp.where(cols == target_local, 1.0, 0.0)) / n_q
    contrib = jax.lax.dot_general(
        g, p_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pj == 0)
    def _():
        dq_ref[:] = contrib

    @pl.when(pj != 0)
    def _():
        dq_ref[:] = dq_ref[:] + contrib


def _bwd_dp_kernel(p_ref, q_ref, lse_ref, dp_ref, *, stride, qt, pt, n_q, n_p):
    pj = pl.program_id(0)
    qi = pl.program_id(1)
    s = jax.lax.dot_general(
        q_ref[:], p_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qt, pt]
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1) + pj * pt
    s = jnp.where(cols_g < n_p, s, NEG_BIG)
    soft = jnp.exp(s - lse_ref[:])
    rows = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (qt, pt), 1)
    target_local = (qi * qt + rows) * stride - pj * pt
    g = (soft - jnp.where(cols == target_local, 1.0, 0.0)) / n_q
    contrib = jax.lax.dot_general(
        g, q_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [pt, H]

    @pl.when(qi == 0)
    def _():
        dp_ref[:] = contrib

    @pl.when(qi != 0)
    def _():
        dp_ref[:] = dp_ref[:] + contrib


@functools.partial(jax.jit, static_argnames=("stride", "n_q", "n_p"))
def _fused_bwd(qp, pp, lse, stride, n_q, n_p):
    Qp, H = qp.shape
    Pp = pp.shape[0]
    qt, pt = min(QT, Qp), min(PT, Pp)
    kw = dict(stride=stride, qt=qt, pt=pt, n_q=n_q, n_p=n_p)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(Qp // qt, Pp // pt),
        in_specs=[
            pl.BlockSpec((qt, H), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, H), lambda qi, pj: (pj, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda qi, pj: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qt, H), lambda qi, pj: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, H), jnp.float32),
        interpret=_interp(),
    )(qp, pp, lse)

    dp = pl.pallas_call(
        functools.partial(_bwd_dp_kernel, **kw),
        grid=(Pp // pt, Qp // qt),
        in_specs=[
            pl.BlockSpec((pt, H), lambda pj, qi: (pj, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, H), lambda pj, qi: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda pj, qi: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pt, H), lambda pj, qi: (pj, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, H), jnp.float32),
        interpret=_interp(),
    )(pp, qp, lse)
    return dq, dp


# ------------------------------ public API ---------------------------------


def _pad_rows(x, tile):
    pad = (-x.shape[0]) % tile
    return (jnp.pad(x, ((0, pad), (0, 0))), pad) if pad else (x, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_contrastive_loss(q_reps: jax.Array, p_reps: jax.Array, stride: int):
    loss, _ = _fwd_impl(q_reps, p_reps, stride)
    return loss


def _fwd_impl(q_reps, p_reps, stride):
    n_q = q_reps.shape[0]
    qp, _ = _pad_rows(q_reps.astype(jnp.float32), min(QT, max(8, n_q)))
    pp, _ = _pad_rows(p_reps.astype(jnp.float32), min(PT, max(8, p_reps.shape[0])))
    return _fused_fwd(qp, pp, stride, n_q, p_reps.shape[0])


def _vjp_fwd(q_reps, p_reps, stride):
    loss, lse = _fwd_impl(q_reps, p_reps, stride)
    return loss, (q_reps, p_reps, lse)


def _vjp_bwd(stride, residuals, g):
    q_reps, p_reps, lse = residuals
    n_q, P = q_reps.shape[0], p_reps.shape[0]
    qt = min(QT, max(8, n_q))
    qp, pad_q = _pad_rows(q_reps.astype(jnp.float32), qt)
    pp, _ = _pad_rows(p_reps.astype(jnp.float32), min(PT, max(8, P)))
    if pad_q:
        # padded rows: huge lse → softmax 0; target col out of range → no -1
        lse = jnp.concatenate(
            [lse[: qp.shape[0] - pad_q], jnp.full((pad_q, 1), 1e30, jnp.float32)]
        )
    dq, dp = _fused_bwd(qp, pp, lse, stride, n_q, P)
    return g * dq[:n_q], g * dp[:P]


fused_contrastive_loss.defvjp(_vjp_fwd, _vjp_bwd)


def contrastive_loss_auto(q_reps, p_reps) -> Tuple[jax.Array, jax.Array]:
    """Fused kernel when targets are stride-form; XLA otherwise. Returns
    (loss, scores) — scores only materialize on the XLA path (None fused)."""
    Q = q_reps.shape[0]
    P = p_reps.shape[0]
    if P % Q == 0:
        stride = P // Q
        loss = fused_contrastive_loss(
            q_reps.astype(jnp.float32), p_reps.astype(jnp.float32), stride
        )
        return loss, None
    return xla_contrastive_loss(q_reps, p_reps)
