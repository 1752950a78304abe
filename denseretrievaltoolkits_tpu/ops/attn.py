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


def _attn_block_kernel(qkv_ref, bias_ref, x_ref, ok_ref, ob_ref, ls_ref,
                       lb_ref, o_ref, *, nh: int, hd: int, sm_scale: float,
                       eps: float):
    """One batch element, attention THROUGH the post-attention layernorm:
    per-head softmax(qk)v as in `_attn_qkv_kernel`, then the output
    projection, residual add, and fp32 layernorm — all in VMEM.  Removes the
    ctx->HBM->o-proj->HBM->LN round trips (4 extra [B,S,H] HBM passes per
    layer on the unfused path)."""
    qkv = qkv_ref[0]  # [Sp, 3H]
    H = nh * hd
    bias = bias_ref[0, 0]  # [Sp]
    ctxs = []
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
        ctxs.append(ctx.astype(qkv.dtype))
    ctx = jnp.concatenate(ctxs, axis=-1)  # [Sp, H]
    attn = jax.lax.dot(ctx, ok_ref[...],
                       preferred_element_type=jnp.float32)  # [Sp, H] fp32
    y = x_ref[0].astype(jnp.float32) + attn + ob_ref[0].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[0] + lb_ref[0]
    o_ref[0] = y.astype(o_ref.dtype)


def _fused_attention_ln_impl(qkv, x, mask, ok, ob, ls, lb, sm_scale, nh, hd,
                             eps):
    B, S, threeH = qkv.shape
    H = nh * hd
    assert threeH == 3 * H, (threeH, nh, hd)
    Sp = _pad_s(S, qkv.dtype)
    pad = Sp - S
    if pad:
        qkv = jnp.concatenate(
            [qkv, jnp.zeros((B, pad, threeH), qkv.dtype)], axis=1)
        x = jnp.concatenate([x, jnp.zeros((B, pad, H), x.dtype)], axis=1)
    bias = (1.0 - mask.astype(jnp.float32)) * _NEG  # [B,S]
    if pad:
        bias = jnp.concatenate(
            [bias, jnp.full((B, pad), _NEG, jnp.float32)], axis=1)
    bias = bias[:, None, :]  # [B,1,Sp]

    out = pl.pallas_call(
        functools.partial(_attn_block_kernel, nh=nh, hd=hd,
                          sm_scale=sm_scale, eps=eps),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sp, threeH), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Sp, H), lambda b: (b, 0, 0)),
            # weight/LN blocks have a constant index map: Mosaic keeps them
            # resident across grid steps (no per-element re-DMA)
            pl.BlockSpec((H, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
            pl.BlockSpec((1, H), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Sp, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qkv, bias, x, ok, ob.reshape(1, H),
      ls.astype(jnp.float32).reshape(1, H),
      lb.astype(jnp.float32).reshape(1, H))
    return out[:, :S, :]  # [B,S,H]


def _reference_attention_ln(qkv, x, mask, ok, ob, ls, lb, sm_scale, nh, hd,
                            eps):
    """XLA recompute formula for the epilogue-fused block — mirrors
    models/bert.py's dense + residual + `_layer_norm` so gradients through
    `fused_attention_ln` match the xla attention path."""
    ctx = _reference_attention(qkv, mask, sm_scale, nh, hd)
    attn = jnp.dot(ctx, ok, preferred_element_type=jnp.float32)
    y = x.astype(jnp.float32) + attn + ob.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls.astype(jnp.float32) + lb.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_attention_ln(qkv, x, mask, ok, ob, ls, lb, sm_scale, nh, hd, eps):
    """Attention + output projection + residual + layernorm, one kernel.

    qkv: [B,S,3H] raw fused-QKV matmul output (layout as
    `fused_qkv_attention`); x: [B,S,H] the block input (residual stream);
    ok/ob: output projection weight [H,H] / bias [H] in the compute dtype;
    ls/lb: layernorm scale/bias [H].  Returns the post-LN hidden [B,S,H].

    Vs. `fused_qkv_attention` + XLA epilogue, this removes the ctx write,
    ctx read, attn_out write, and attn_out+x read — ~4 HBM passes of
    [B,S,H] per layer (BASELINE.md round-5 profile: the residual gap to the
    matmul floor was exactly these elementwise passes)."""
    return _fused_attention_ln_impl(qkv, x, mask, ok, ob, ls, lb, sm_scale,
                                    nh, hd, eps)


def _fwd_ln(qkv, x, mask, ok, ob, ls, lb, sm_scale, nh, hd, eps):
    out = _fused_attention_ln_impl(qkv, x, mask, ok, ob, ls, lb, sm_scale,
                                   nh, hd, eps)
    return out, (qkv, x, mask, ok, ob, ls, lb)


def _bwd_ln(sm_scale, nh, hd, eps, res, g):
    qkv, x, mask, ok, ob, ls, lb = res
    _, vjp = jax.vjp(
        lambda t, xx, w, wb, s, b: _reference_attention_ln(
            t, xx, mask, w, wb, s, b, sm_scale, nh, hd, eps),
        qkv, x, ok, ob, ls, lb)
    dqkv, dx, dok, dob, dls, dlb = vjp(g)
    return dqkv, dx, None, dok, dob, dls, dlb


fused_attention_ln.defvjp(_fwd_ln, _bwd_ln)


def _erf_approx(x):
    """erf for Mosaic (no erf/erfc TC lowering): Abramowitz-Stegun 7.1.26,
    max abs error 1.5e-7 over the real line.  fp32 in, fp32 out."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-a * a))


def _mlp_ln_kernel(x_ref, wi_ref, bi_ref, wo_ref, bo_ref, ls_ref, lb_ref,
                   o_ref, acc_ref, *, nf: int, eps: float):
    """Grid (B, nf), f fastest.  Per step: one F-chunk of the MLP —
    h = gelu(x @ wi[:, f]) ; acc += h @ wo[f, :].  On the last chunk the
    residual + bias + fp32 layernorm run and the block is emitted.  The
    [B,S,F] gelu intermediate never exists in HBM (2 full passes saved),
    and the wi/wo chunks double-buffer at 2x2.4 MB instead of needing the
    whole 9.4 MB weight pair resident."""
    f = pl.program_id(1)
    x = x_ref[0]  # [Sp, H]
    h = jax.lax.dot(x, wi_ref[...], preferred_element_type=jnp.float32)
    h = h + bi_ref[0].astype(jnp.float32)
    # exact gelu: Mosaic lowers neither erf nor erfc (2026-08-19), so erf
    # is computed in-kernel with the Abramowitz-Stegun 7.1.26 rational
    # approximation (max abs error 1.5e-7 — below bf16/fp32-test noise);
    # only exp is required, which Mosaic has
    h = (0.5 * h * (1.0 + _erf_approx(h * (2.0 ** -0.5)))).astype(x.dtype)
    part = jax.lax.dot(h, wo_ref[...], preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(f != 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(f == nf - 1)
    def _emit():
        y = (x.astype(jnp.float32) + acc_ref[...]
             + bo_ref[0].astype(jnp.float32))
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * ls_ref[0] + lb_ref[0]
        o_ref[0] = y.astype(o_ref.dtype)


def _fused_mlp_ln_impl(x, wi, bi, wo, bo, ls, lb, eps):
    B, S, H = x.shape
    F = wi.shape[-1]
    Sp = _pad_s(S, x.dtype)
    pad = Sp - S
    if pad:
        x = jnp.concatenate([x, jnp.zeros((B, pad, H), x.dtype)], axis=1)
    # F-chunk size: 768 keeps the double-buffered wi+wo chunks at ~4.8 MB
    # bf16 and each chunk matmul MXU-shaped; fall back to one chunk for
    # tiny test configs.
    cf = 768 if F % 768 == 0 else F
    nf = F // cf

    out = pl.pallas_call(
        functools.partial(_mlp_ln_kernel, nf=nf, eps=eps),
        grid=(B, nf),
        in_specs=[
            pl.BlockSpec((1, Sp, H), lambda b, f: (b, 0, 0)),
            pl.BlockSpec((H, cf), lambda b, f: (0, f)),
            pl.BlockSpec((1, cf), lambda b, f: (0, f)),
            pl.BlockSpec((cf, H), lambda b, f: (f, 0)),
            pl.BlockSpec((1, H), lambda b, f: (0, 0)),
            pl.BlockSpec((1, H), lambda b, f: (0, 0)),
            pl.BlockSpec((1, H), lambda b, f: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Sp, H), lambda b, f: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((Sp, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, wi, bi.reshape(1, F), wo, bo.reshape(1, H),
      ls.astype(jnp.float32).reshape(1, H),
      lb.astype(jnp.float32).reshape(1, H))
    return out[:, :S, :]


def _reference_mlp_ln(x, wi, bi, wo, bo, ls, lb, eps):
    """XLA recompute formula mirroring models/bert.py's MLP + `_layer_norm`
    (used for the recompute backward of `fused_mlp_ln`)."""
    h = jnp.dot(x, wi, preferred_element_type=jnp.float32)
    h = h + bi.astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = (x.astype(jnp.float32)
         + jnp.dot(h, wo, preferred_element_type=jnp.float32)
         + bo.astype(jnp.float32))
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls.astype(jnp.float32) + lb.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_mlp_ln(x, wi, bi, wo, bo, ls, lb, eps):
    """MLP (wi -> exact gelu -> wo) + residual + layernorm, one kernel.

    x: [B,S,H]; wi/bi/wo/bo in the compute dtype; ls/lb layernorm params.
    Returns the post-LN hidden [B,S,H].  The [B,S,F] gelu intermediate and
    the pre-LN sum never reach HBM.  Backward is flash-style recompute
    through `_reference_mlp_ln`, so gradients match the xla path."""
    return _fused_mlp_ln_impl(x, wi, bi, wo, bo, ls, lb, eps)


def _fwd_mlp(x, wi, bi, wo, bo, ls, lb, eps):
    return _fused_mlp_ln_impl(x, wi, bi, wo, bo, ls, lb, eps), (
        x, wi, bi, wo, bo, ls, lb)


def _bwd_mlp(eps, res, g):
    x, wi, bi, wo, bo, ls, lb = res
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp_ln(*a, eps), x, wi, bi, wo, bo, ls, lb)
    return vjp(g)


fused_mlp_ln.defvjp(_fwd_mlp, _bwd_mlp)


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
