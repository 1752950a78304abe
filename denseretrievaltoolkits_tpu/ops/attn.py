"""Fused short-sequence attention kernel (Pallas, TPU).

Why this exists (BASELINE.md round-4 encoder profile): at the canonical
passage shape S=156, hd=64 (reference run.sh:18-19 p_max_len; bert-base), the
XLA attention path materializes the [B,nh,S,S] fp32 score tensor and the
bf16 prob tensor in HBM every layer (~450 MB of traffic per encode batch),
and the stock `jax.experimental.pallas.ops.tpu.flash_attention` kernel pads
S 156->256 and runs the full multi-block running-softmax machinery — it
measured 1.9x SLOWER than XLA end-to-end.  But at S=156 one (batch, head)
attention is tiny: Q/K/V are [156,64] and the whole score matrix is 97 KB —
everything fits in VMEM at once.  So: one grid step per batch element,
ALL heads per step via a head-batched dot, S padded only to 160 (the fp32
sublane granule), softmax fused in-register, and neither scores nor probs
ever touch HBM.

Numerics match the XLA path in models/bert.py (`_encoder_block`): scores are
computed and softmaxed in fp32, probs cast to the compute dtype for the
context matmul.

Backward: flash-style recomputation — the forward saves only (q, k, v, mask)
and the VJP re-derives the gradient with the plain XLA formula.  Same
activation-memory profile as `remat="attn"` with the fused forward speed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, sm_scale: float):
    """One batch element: q/k/v [1, nh, Sp, hd], bias [1, Sp] fp32."""
    q = q_ref[0]  # [nh, Sp, hd]
    k = k_ref[0]
    v = v_ref[0]
    # head-batched QK^T, fp32 accumulation on the MXU
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nh, Sp, Sp]
    s = s * sm_scale + bias_ref[0][None, None, :]
    # stable softmax, fused in VMEM (never leaves the chip)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [nh, Sp, hd]
    out_ref[0] = ctx.astype(out_ref.dtype)


def _pad_s(s: int, dtype) -> int:
    """Pad S to the sublane granule (8 fp32 / 16 bf16) — NOT to 128."""
    g = 16 if dtype == jnp.bfloat16 else 8
    return -(-s // g) * g


def _fused_attention_impl(q, k, v, mask, sm_scale):
    B, S, nh, hd = q.shape
    Sp = _pad_s(S, q.dtype)
    pad = Sp - S

    def prep(t):  # [B,S,nh,hd] -> [B,nh,Sp,hd]
        t = jnp.transpose(t, (0, 2, 1, 3))
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else t

    qt, kt, vt = prep(q), prep(k), prep(v)
    bias = (1.0 - mask.astype(jnp.float32)) * _NEG  # [B,S]
    if pad:
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=_NEG)

    blk = pl.BlockSpec((1, nh, Sp, hd), lambda b: (b, 0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale),
        grid=(B,),
        in_specs=[blk, blk, blk, pl.BlockSpec((1, Sp), lambda b: (b, 0))],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, nh, Sp, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt, bias)
    return jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))  # [B,S,nh,hd]


def _reference_attention(q, k, v, mask, sm_scale):
    """The XLA formula from models/bert.py:_encoder_block — used for the
    recompute backward so gradients match the xla attention path exactly."""
    mask_bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * _NEG
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale + mask_bias
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_short_attention(q, k, v, mask, sm_scale):
    """Fused single-block attention for short sequences.

    q, k, v: [B, S, nh, hd] (any float dtype); mask: [B, S] 0/1.
    Returns [B, S, nh, hd] in q's dtype.  Scores/probs never reach HBM.
    """
    return _fused_attention_impl(q, k, v, mask, sm_scale)


def _fwd(q, k, v, mask, sm_scale):
    return _fused_attention_impl(q, k, v, mask, sm_scale), (q, k, v, mask)


def _bwd(sm_scale, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, mask, sm_scale),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_short_attention.defvjp(_fwd, _bwd)
