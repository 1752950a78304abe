"""Fused short-sequence attention kernel (Pallas, TPU).

Why this exists (BASELINE.md round-4/5 encoder profiles): at the canonical
passage shape S=156, hd=64 (reference run.sh:18-19 p_max_len; bert-base), the
XLA attention path materializes the [B,nh,S,S] fp32 score tensor in HBM every
layer, and the stock `jax.experimental.pallas.ops.tpu.flash_attention` kernel
pads S 156->256 and runs the full multi-block running-softmax machinery — it
measured 1.9x SLOWER than XLA end-to-end.  At S=156 one batch element's whole
attention fits in VMEM (scores are 100 KB/head), so a single-block kernel can
fuse everything.

Two designs were measured on the v5e (2026-08-19):

1. q/k/v kernel on [B,S,nh,hd] inputs: the isolated inner won 1.40x over the
   XLA einsum pair, but LOST in-model (110 vs 97.5 ms / 12L) — the host-side
   transposes to [B*nh,Sp,hd] are real HBM copies, while the XLA path's
   layout changes fuse into the surrounding matmuls for free.
2. THIS design: the kernel consumes the raw QKV projection output [B,S,3H]
   directly (one block per batch element, heads split in VMEM by static
   64-lane slices), emitting [B,S,H] ready for the output projection.  No
   host-side layout change at all.  Full-chain micro (qkv matmul ->
   attention -> ctx): 3.88 ms vs XLA 5.74 ms = 1.48x.

Numerics match the XLA path in models/bert.py (`_encoder_block`): scores are
computed and softmaxed in fp32, probs cast to the compute dtype for the
context matmul.

Backward: flash-style recomputation — the forward saves only (qkv, mask) and
the VJP re-derives gradients through the plain XLA formula, so training with
attention='fused' matches the xla path's gradients while the forward keeps
the kernel speed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _attn_qkv_kernel(qkv_ref, bias_ref, o_ref, *, nh: int, hd: int,
                     sm_scale: float):
    """One batch element: qkv [1, Sp, 3H], bias [1, 1, Sp] fp32 (0 real /
    -1e9 pad), out [1, Sp, H].  Heads are static 64-lane slices — no
    transpose anywhere."""
    qkv = qkv_ref[0]  # [Sp, 3H]
    H = nh * hd
    bias = bias_ref[0, 0]  # [Sp]
    for h in range(nh):
        qh = qkv[:, h * hd:(h + 1) * hd]
        kh = qkv[:, H + h * hd:H + (h + 1) * hd]
        vh = qkv[:, 2 * H + h * hd:2 * H + (h + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [Sp, Sp]
        s = s * sm_scale + bias[None, :]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vh.dtype)
        ctx = jax.lax.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = ctx.astype(o_ref.dtype)


def _pad_s(s: int, dtype) -> int:
    """Pad S to the sublane granule (8 fp32 / 16 bf16) — NOT to 128."""
    g = 16 if dtype == jnp.bfloat16 else 8
    return -(-s // g) * g


def _fused_attention_impl(qkv, mask, sm_scale, nh, hd):
    B, S, threeH = qkv.shape
    H = nh * hd
    assert threeH == 3 * H, (threeH, nh, hd)
    Sp = _pad_s(S, qkv.dtype)
    pad = Sp - S
    if pad:
        # concatenate, not jnp.pad: pad's closed_call lowering hits a jax
        # MLIR cache KeyError inside the scanned layer on TPU (2026-08-19)
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((B, pad, threeH), qkv.dtype)], axis=1)
    bias = (1.0 - mask.astype(jnp.float32)) * _NEG  # [B,S]
    if pad:
        bias = jnp.concatenate(
            [bias, jnp.full((B, pad), _NEG, jnp.float32)], axis=1)
    # the singleton middle axis keeps the bias block's trailing dims (1, Sp):
    # Mosaic requires the sublane dim to divide 8 OR equal the array dim
    bias = bias[:, None, :]  # [B,1,Sp]

    out = pl.pallas_call(
        functools.partial(_attn_qkv_kernel, nh=nh, hd=hd, sm_scale=sm_scale),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Sp, threeH), lambda b: (b, 0, 0)),
                  pl.BlockSpec((1, 1, Sp), lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, Sp, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, H), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv, bias)
    return out[:, :S, :]  # [B,S,H]


def _reference_attention(qkv, mask, sm_scale, nh, hd):
    """The XLA formula from models/bert.py:_encoder_block — used for the
    recompute backward so gradients match the xla attention path exactly."""
    B, S, _ = qkv.shape
    H = nh * hd
    q = qkv[..., :H].reshape(B, S, nh, hd)
    k = qkv[..., H:2 * H].reshape(B, S, nh, hd)
    v = qkv[..., 2 * H:].reshape(B, S, nh, hd)
    mask_bias = (1.0 - mask.astype(jnp.float32))[:, None, None, :] * _NEG
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * sm_scale + mask_bias
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    return ctx.reshape(B, S, H)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_qkv_attention(qkv, mask, sm_scale, nh, hd):
    """Fused single-block attention over the raw QKV projection output.

    qkv: [B, S, 3*nh*hd] laid out [q | k | v], each [.., nh*hd] with heads
    contiguous (exactly the fused-QKV matmul output in models/bert.py);
    mask: [B, S] 0/1.  Returns the context [B, S, nh*hd] in qkv's dtype.
    Scores/probs never reach HBM; S pads only to the sublane granule.
    """
    return _fused_attention_impl(qkv, mask, sm_scale, nh, hd)


def _fwd(qkv, mask, sm_scale, nh, hd):
    return _fused_attention_impl(qkv, mask, sm_scale, nh, hd), (qkv, mask)


def _bwd(sm_scale, nh, hd, res, g):
    qkv, mask = res
    _, vjp = jax.vjp(
        lambda t: _reference_attention(t, mask, sm_scale, nh, hd), qkv)
    (dqkv,) = vjp(g)
    return dqkv, None


fused_qkv_attention.defvjp(_fwd, _bwd)
