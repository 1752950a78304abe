"""Functional JAX T5: encoder tower + single-step decoder scoring.

Covers the reference's T5 paths:
- ``T5EncoderModel`` towers for the biencoder (``encoder_only``,
  DRT/model/biencoder.py:131-135,169) — here a pure-functional encoder with
  stacked layers under ``lax.scan``, RMS layernorm in fp32, and the bucketed
  relative position bias computed once and reused across layers;
- ``T5ForConditionalGeneration`` reranker scoring: run the encoder over the
  (query, passage) pair, take ONE decoder step (decoder_input_ids = 0) and
  read the lm logits at the pos/neg token ids (DRT/model/reranker.py:115-119).
  A full autoregressive decoder is unnecessary for step-0 logits: the decoder
  self-attention over a single position collapses to its v-projection.

Weight import from HF torch T5 checkpoints lives at the bottom.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    pad_token_id: int = 0
    tie_word_embeddings: bool = True
    is_gated_act: bool = False  # True for t5 v1.1 (gelu gated)

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, blob: str) -> "T5Config":
        data = json.loads(blob)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})

    @classmethod
    def from_hf_config(cls, hf) -> "T5Config":
        return cls(
            vocab_size=hf.vocab_size,
            d_model=hf.d_model,
            d_kv=hf.d_kv,
            d_ff=hf.d_ff,
            num_layers=hf.num_layers,
            num_heads=hf.num_heads,
            relative_attention_num_buckets=hf.relative_attention_num_buckets,
            relative_attention_max_distance=getattr(hf, "relative_attention_max_distance", 128),
            layer_norm_epsilon=hf.layer_norm_epsilon,
            pad_token_id=hf.pad_token_id,
            tie_word_embeddings=getattr(hf, "tie_word_embeddings", True),
            is_gated_act=("gated" in getattr(hf, "feed_forward_proj", "relu")),
        )


def save_config(config: T5Config, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "t5_config.json"), "w") as fh:
        fh.write(config.to_json())


def load_config(path: str) -> T5Config:
    with open(os.path.join(path, "t5_config.json")) as fh:
        return T5Config.from_json(fh.read())


# ---------------------------------------------------------------------------
# Core math
# ---------------------------------------------------------------------------


def _rms_norm(x, scale, eps):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)).astype(dt)


def _relative_position_bucket(relative_position, bidirectional, num_buckets, max_distance):
    """T5's bucketed relative positions (HF modeling_t5 semantics)."""
    ret = 0
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret += (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    ret += jnp.where(is_small, n, val_if_large)
    return ret


def _position_bias(rel_bias_table, q_len, k_len, config: T5Config, bidirectional=True):
    """[1, heads, q_len, k_len] additive bias from the bucket embedding table."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, bidirectional,
        config.relative_attention_num_buckets,
        config.relative_attention_max_distance,
    )
    bias = jnp.take(rel_bias_table, buckets, axis=0)  # [q, k, heads]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attention(x_q, x_kv, layer, prefix, config, mask_bias, pos_bias, compute_dtype):
    B, Sq, D = x_q.shape
    Sk = x_kv.shape[1]
    nh, dk = config.num_heads, config.d_kv

    def proj(h, name):
        return jnp.dot(
            h, layer[f"{prefix}_{name}"].astype(compute_dtype),
            preferred_element_type=compute_dtype,
        )

    def fused(h, names):
        # One [D, len(names)*I] matmul instead of siblings sharing an LHS:
        # XLA won't horizontally fuse them, so the unfused form re-reads the
        # [B,S,D] activations once per projection (same rationale as
        # bert.py's fused QKV).
        kern = jnp.concatenate(
            [layer[f"{prefix}_{n}"] for n in names], axis=-1).astype(compute_dtype)
        out = jnp.dot(h, kern, preferred_element_type=compute_dtype)
        I = config.inner_dim
        return [out[..., i * I:(i + 1) * I] for i in range(len(names))]

    if x_q is x_kv:  # self-attention: one fused QKV projection
        q, k, v = fused(x_q, ("q", "k", "v"))
    else:  # cross-attention: q from the decoder stream, fused KV from memory
        q = proj(x_q, "q")
        k, v = fused(x_kv, ("k", "v"))
    k = k.reshape(B, Sk, nh, dk)
    if prefix == "attn" and "lora_q_A" in layer:  # encoder LoRA (models/lora.py)
        def delta(h, a, b):
            low = jnp.dot(h, a.astype(compute_dtype), preferred_element_type=compute_dtype)
            return jnp.dot(low, b.astype(compute_dtype), preferred_element_type=compute_dtype)

        q = q + delta(x_q, layer["lora_q_A"], layer["lora_q_B"])
        v = v + delta(x_kv, layer["lora_v_A"], layer["lora_v_B"])
    q = q.reshape(B, Sq, nh, dk)
    v = v.reshape(B, Sk, nh, dk)
    # NB: T5 does NOT scale q by 1/sqrt(d_kv)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores + mask_bias + pos_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=compute_dtype)
    return proj(ctx.reshape(B, Sq, config.inner_dim), "o")


def _ffn(x, layer, config, compute_dtype):
    if config.is_gated_act:
        wi0 = jnp.dot(x, layer["wi_0"].astype(compute_dtype), preferred_element_type=compute_dtype)
        wi1 = jnp.dot(x, layer["wi_1"].astype(compute_dtype), preferred_element_type=compute_dtype)
        h = jax.nn.gelu(wi0, approximate=True) * wi1
    else:
        h = jnp.dot(x, layer["wi"].astype(compute_dtype), preferred_element_type=compute_dtype)
        h = jax.nn.relu(h)
    return jnp.dot(h, layer["wo"].astype(compute_dtype), preferred_element_type=compute_dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def t5_encode(
    params: Params,
    config: T5Config,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids=None,  # accepted for batch-shape parity; unused by T5
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Encoder forward → last_hidden_state [B, S, D]."""
    del token_type_ids
    c = config
    B, S = input_ids.shape
    x = jnp.take(params["shared"], input_ids, axis=0).astype(compute_dtype)
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    pos_bias = _position_bias(params["enc_rel_bias"], S, S, c, bidirectional=True)

    def block(h, layer):
        a_in = _rms_norm(h, layer["attn_ln"], c.layer_norm_epsilon)
        h = h + _attention(a_in, a_in, layer, "attn", c, mask_bias, pos_bias, compute_dtype)
        f_in = _rms_norm(h, layer["ffn_ln"], c.layer_norm_epsilon)
        h = h + _ffn(f_in, layer, c, compute_dtype)
        return h

    if remat:
        block = jax.checkpoint(block)

    def scan_fn(h, layer):
        return block(h, layer), None

    x, _ = jax.lax.scan(scan_fn, x, params["encoder"])
    return _rms_norm(x, params["enc_final_ln"], c.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# Single-step decoder (reranker token scoring)
# ---------------------------------------------------------------------------


def t5_decode_step0(
    params: Params,
    config: T5Config,
    encoder_hidden: jax.Array,
    encoder_mask: jax.Array,
    compute_dtype=jnp.float32,
    return_logits: bool = True,
) -> jax.Array:
    """One decoder step with decoder_input_ids=0 → lm logits [B, vocab]
    (or the step-0 decoder hidden state [B, D] with return_logits=False,
    which is the full-T5 biencoder's rep, reference biencoder.py:131-135).

    Exactly what the reference's T5 reranker consumes (reranker.py:115-119):
    logits at step 0 for the pos/neg token ids."""
    c = config
    B = encoder_hidden.shape[0]
    x = jnp.broadcast_to(
        params["shared"][c.pad_token_id][None, None, :], (B, 1, c.d_model)
    ).astype(compute_dtype)
    enc_bias = (1.0 - encoder_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    self_bias = _position_bias(params["dec_rel_bias"], 1, 1, c, bidirectional=False)
    zero = jnp.zeros((1, 1, 1, 1), jnp.float32)
    enc_h = encoder_hidden.astype(compute_dtype)

    def block(h, layer):
        a_in = _rms_norm(h, layer["self_ln"], c.layer_norm_epsilon)
        h = h + _attention(a_in, a_in, layer, "self", c, zero, self_bias, compute_dtype)
        x_in = _rms_norm(h, layer["cross_ln"], c.layer_norm_epsilon)
        h = h + _attention(x_in, enc_h, layer, "cross", c, enc_bias, zero, compute_dtype)
        f_in = _rms_norm(h, layer["ffn_ln"], c.layer_norm_epsilon)
        h = h + _ffn(f_in, layer, c, compute_dtype)
        return h

    def scan_fn(h, layer):
        return block(h, layer), None

    x, _ = jax.lax.scan(scan_fn, x, params["decoder"])
    x = _rms_norm(x, params["dec_final_ln"], c.layer_norm_epsilon)
    x32 = x[:, 0, :].astype(jnp.float32)
    if not return_logits:
        return x32
    if config.tie_word_embeddings:
        x32 = x32 * (c.d_model ** -0.5)
        lm = params["shared"].astype(jnp.float32)
        return jnp.dot(x32, lm.T, preferred_element_type=jnp.float32)
    return jnp.dot(x32, params["lm_head"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Init + HF import + persistence
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, config: T5Config, with_decoder: bool = False,
                dtype=jnp.float32) -> Params:
    c = config
    L, D, F, I = c.num_layers, c.d_model, c.d_ff, c.inner_dim
    keys = iter(jax.random.split(rng, 24))

    def dense(shape, std):
        return (jax.random.normal(next(keys), shape) * std).astype(dtype)

    def enc_layers():
        layers = {
            "attn_q": dense((L, D, I), (D * c.d_kv) ** -0.5),
            "attn_k": dense((L, D, I), D ** -0.5),
            "attn_v": dense((L, D, I), D ** -0.5),
            "attn_o": dense((L, I, D), I ** -0.5),
            "attn_ln": jnp.ones((L, D), dtype),
            "ffn_ln": jnp.ones((L, D), dtype),
            "wo": dense((L, F, D), F ** -0.5),
        }
        if c.is_gated_act:
            layers["wi_0"] = dense((L, D, F), D ** -0.5)
            layers["wi_1"] = dense((L, D, F), D ** -0.5)
        else:
            layers["wi"] = dense((L, D, F), D ** -0.5)
        return layers

    params: Params = {
        "shared": dense((c.vocab_size, D), 1.0),
        "enc_rel_bias": dense((c.relative_attention_num_buckets, c.num_heads), 1.0),
        "encoder": enc_layers(),
        "enc_final_ln": jnp.ones((D,), dtype),
    }
    if with_decoder:
        dec = {}
        for prefix in ("self", "cross"):
            dec[f"{prefix}_q"] = dense((L, D, I), (D * c.d_kv) ** -0.5)
            dec[f"{prefix}_k"] = dense((L, D, I), D ** -0.5)
            dec[f"{prefix}_v"] = dense((L, D, I), D ** -0.5)
            dec[f"{prefix}_o"] = dense((L, I, D), I ** -0.5)
        dec["self_ln"] = jnp.ones((L, D), dtype)
        dec["cross_ln"] = jnp.ones((L, D), dtype)
        dec["ffn_ln"] = jnp.ones((L, D), dtype)
        dec["wo"] = dense((L, F, D), F ** -0.5)
        if c.is_gated_act:
            dec["wi_0"] = dense((L, D, F), D ** -0.5)
            dec["wi_1"] = dense((L, D, F), D ** -0.5)
        else:
            dec["wi"] = dense((L, D, F), D ** -0.5)
        params["decoder"] = dec
        params["dec_rel_bias"] = dense((c.relative_attention_num_buckets, c.num_heads), 1.0)
        params["dec_final_ln"] = jnp.ones((D,), dtype)
        if not c.tie_word_embeddings:
            params["lm_head"] = dense((D, c.vocab_size), D ** -0.5)
    return params


def params_from_torch_state_dict(state_dict, config: T5Config,
                                 with_decoder: bool = False) -> Params:
    """Convert an HF torch T5EncoderModel / T5ForConditionalGeneration
    state_dict into our stacked pytree."""

    def t(name):
        return np.ascontiguousarray(state_dict[name].detach().cpu().numpy().T)

    def a(name):
        return state_dict[name].detach().cpu().numpy()

    L = config.num_layers

    def stack_enc(fmt, transpose=True):
        get = t if transpose else a
        return np.stack([get(fmt.format(i)) for i in range(L)])

    enc = {
        "attn_q": stack_enc("encoder.block.{}.layer.0.SelfAttention.q.weight"),
        "attn_k": stack_enc("encoder.block.{}.layer.0.SelfAttention.k.weight"),
        "attn_v": stack_enc("encoder.block.{}.layer.0.SelfAttention.v.weight"),
        "attn_o": stack_enc("encoder.block.{}.layer.0.SelfAttention.o.weight"),
        "attn_ln": stack_enc("encoder.block.{}.layer.0.layer_norm.weight", False),
        "ffn_ln": stack_enc("encoder.block.{}.layer.1.layer_norm.weight", False),
    }
    if config.is_gated_act:
        enc["wi_0"] = stack_enc("encoder.block.{}.layer.1.DenseReluDense.wi_0.weight")
        enc["wi_1"] = stack_enc("encoder.block.{}.layer.1.DenseReluDense.wi_1.weight")
    else:
        enc["wi"] = stack_enc("encoder.block.{}.layer.1.DenseReluDense.wi.weight")
    enc["wo"] = stack_enc("encoder.block.{}.layer.1.DenseReluDense.wo.weight")

    params: Params = {
        "shared": a("shared.weight"),
        "enc_rel_bias": a(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "encoder": enc,
        "enc_final_ln": a("encoder.final_layer_norm.weight"),
    }

    if with_decoder:
        dec = {
            "self_q": stack_enc("decoder.block.{}.layer.0.SelfAttention.q.weight"),
            "self_k": stack_enc("decoder.block.{}.layer.0.SelfAttention.k.weight"),
            "self_v": stack_enc("decoder.block.{}.layer.0.SelfAttention.v.weight"),
            "self_o": stack_enc("decoder.block.{}.layer.0.SelfAttention.o.weight"),
            "self_ln": stack_enc("decoder.block.{}.layer.0.layer_norm.weight", False),
            "cross_q": stack_enc("decoder.block.{}.layer.1.EncDecAttention.q.weight"),
            "cross_k": stack_enc("decoder.block.{}.layer.1.EncDecAttention.k.weight"),
            "cross_v": stack_enc("decoder.block.{}.layer.1.EncDecAttention.v.weight"),
            "cross_o": stack_enc("decoder.block.{}.layer.1.EncDecAttention.o.weight"),
            "cross_ln": stack_enc("decoder.block.{}.layer.1.layer_norm.weight", False),
            "ffn_ln": stack_enc("decoder.block.{}.layer.2.layer_norm.weight", False),
            "wo": stack_enc("decoder.block.{}.layer.2.DenseReluDense.wo.weight"),
        }
        if config.is_gated_act:
            dec["wi_0"] = stack_enc("decoder.block.{}.layer.2.DenseReluDense.wi_0.weight")
            dec["wi_1"] = stack_enc("decoder.block.{}.layer.2.DenseReluDense.wi_1.weight")
        else:
            dec["wi"] = stack_enc("decoder.block.{}.layer.2.DenseReluDense.wi.weight")
        params["decoder"] = dec
        params["dec_rel_bias"] = a(
            "decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        )
        params["dec_final_ln"] = a("decoder.final_layer_norm.weight")
        if not config.tie_word_embeddings and "lm_head.weight" in state_dict:
            params["lm_head"] = t("lm_head.weight")

    return jax.tree.map(jnp.asarray, params)
