"""Functional JAX BERT encoder, designed TPU-first.

Replaces the reference's HF-torch towers (``DRT/model/biencoder.py:205-206``,
``AutoModel.from_pretrained``) with a pure-functional encoder:

- parameters are a plain pytree with the 12 transformer blocks **stacked on a
  leading layer axis** and iterated with ``jax.lax.scan`` — one compiled block
  regardless of depth, remat-friendly, and trivially shardable;
- compute dtype is configurable (bf16 on the MXU by default for training);
  layernorms and the softmax run in fp32 for stability;
- all shapes are static (the data layer pads to q_max/p_max), so every step
  compiles exactly once;
- weight import from / export to HF torch ``BertModel`` checkpoints lives in
  ``models/hf_import.py``.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    initializer_range: float = 0.02

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, blob: str) -> "BertConfig":
        data = json.loads(blob)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in names})

    @classmethod
    def from_hf_config(cls, hf_config) -> "BertConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            layer_norm_eps=hf_config.layer_norm_eps,
            pad_token_id=hf_config.pad_token_id,
        )


def save_config(config: BertConfig, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "bert_config.json"), "w") as fh:
        fh.write(config.to_json())


def load_config(path: str) -> BertConfig:
    with open(os.path.join(path, "bert_config.json")) as fh:
        return BertConfig.from_json(fh.read())


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _dense_init(key, shape, std, dtype):
    return (jax.random.normal(key, shape) * std).astype(dtype)


def init_params(rng: jax.Array, config: BertConfig, dtype=jnp.float32) -> Params:
    """Random-init a parameter pytree. Layer weights stacked on axis 0."""
    c = config
    L, H, F, V = c.num_hidden_layers, c.hidden_size, c.intermediate_size, c.vocab_size
    std = c.initializer_range
    keys = iter(jax.random.split(rng, 16))

    def zeros(*shape):
        return jnp.zeros(shape, dtype)

    def ones(*shape):
        return jnp.ones(shape, dtype)

    params: Params = {
        "embeddings": {
            "word": _dense_init(next(keys), (V, H), std, dtype),
            "position": _dense_init(next(keys), (c.max_position_embeddings, H), std, dtype),
            "token_type": _dense_init(next(keys), (c.type_vocab_size, H), std, dtype),
            "ln_scale": ones(H),
            "ln_bias": zeros(H),
        },
        "layers": {
            "q_kernel": _dense_init(next(keys), (L, H, H), std, dtype),
            "q_bias": zeros(L, H),
            "k_kernel": _dense_init(next(keys), (L, H, H), std, dtype),
            "k_bias": zeros(L, H),
            "v_kernel": _dense_init(next(keys), (L, H, H), std, dtype),
            "v_bias": zeros(L, H),
            "o_kernel": _dense_init(next(keys), (L, H, H), std, dtype),
            "o_bias": zeros(L, H),
            "attn_ln_scale": ones(L, H),
            "attn_ln_bias": zeros(L, H),
            "wi_kernel": _dense_init(next(keys), (L, H, F), std, dtype),
            "wi_bias": zeros(L, F),
            "wo_kernel": _dense_init(next(keys), (L, F, H), std, dtype),
            "wo_bias": zeros(L, H),
            "mlp_ln_scale": ones(L, H),
            "mlp_ln_bias": zeros(L, H),
        },
        "pooler": {
            "kernel": _dense_init(next(keys), (H, H), std, dtype),
            "bias": zeros(H),
        },
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps):
    """LayerNorm in fp32 regardless of compute dtype."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dt)


def _flash_attention(q, k, v, seg, hd):
    """Pallas flash attention on [B,S,nh,hd] inputs with a [B,S] 0/1 mask.

    Pads S to the kernel's 128-lane block granularity; padding tokens carry
    segment id 0 (same as input padding), so they attend only among
    themselves — real rows never see them and no output row is all-masked
    (keeps pad-row outputs finite; pooling multiplies by the mask, so a NaN
    there would poison masked-mean/max).  Avoids materializing the
    [B,nh,S,S] fp32 score/prob tensors in HBM entirely.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, S, nh, _ = q.shape
    Sp = -(-S // 128) * 128
    pad = Sp - S

    def prep(t):
        t = jnp.transpose(t, (0, 2, 1, 3))  # [B,nh,S,hd]
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else t

    segp = jnp.pad(seg, ((0, 0), (0, pad))) if pad else seg
    out = flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(segp, segp),
        sm_scale=1.0 / math.sqrt(hd),
    )
    out = jnp.transpose(out[:, :, :S, :], (0, 2, 1, 3))  # [B,S,nh,hd]
    return out


def _encoder_block(x, layer, mask_bias, seg_ids, config: BertConfig, compute_dtype,
                   tag_attn: bool = False, attention: str = "xla"):
    """One post-LN BERT block. ``x``: [B,S,H]; ``mask_bias``: [B,1,1,S] fp32;
    ``seg_ids``: [B,S] int32 0/1 mask (only read on the flash path)."""
    c = config
    B, S, H = x.shape
    nh, hd = c.num_attention_heads, c.head_dim

    def dense(h, kernel, bias):
        return (
            jnp.dot(h, kernel.astype(compute_dtype), preferred_element_type=compute_dtype)
            + bias.astype(compute_dtype)
        )

    # Fused QKV: one [H,3H] matmul instead of three [H,H]. XLA does not
    # horizontally fuse sibling dots sharing an LHS, so the unfused form reads
    # the [B,S,H] activations from HBM three times; the concat costs one small
    # [H,3H] weight copy per layer and saves two activation passes.
    qkv_kernel = jnp.concatenate(
        [layer["q_kernel"], layer["k_kernel"], layer["v_kernel"]], axis=-1)
    qkv_bias = jnp.concatenate(
        [layer["q_bias"], layer["k_bias"], layer["v_bias"]], axis=-1)
    qkv = dense(x, qkv_kernel, qkv_bias)
    if attention == "fused" and "lora_q_A" not in layer:
        # single-block VMEM-resident kernel for short S (ops/attn.py): the
        # kernel consumes the raw [B,S,3H] QKV output directly (heads split
        # in VMEM), so no host-side transpose/reshape ever materializes;
        # scores/probs never reach HBM, and S pads to the sublane granule
        # (156->160) instead of flash's 128-lane block (156->256).
        # Measured 1.48x over the xla chain on v5e (BASELINE.md r5 profile).
        # The kernel runs THROUGH the post-attention layernorm (o-proj +
        # residual + LN in VMEM), removing 4 more [B,S,H] HBM passes/layer;
        # the residual add happens in fp32 inside the kernel (the xla path
        # sums in compute dtype before the LN upcast — strictly less
        # accurate, parity within test tolerances).
        from ..ops.attn import fused_attention_ln, fused_mlp_ln

        x = fused_attention_ln(
            qkv, x, seg_ids,
            layer["o_kernel"].astype(compute_dtype),
            layer["o_bias"].astype(compute_dtype),
            layer["attn_ln_scale"], layer["attn_ln_bias"],
            1.0 / math.sqrt(hd), nh, hd, c.layer_norm_eps)
        # F-blocked MLP+LN kernel: the [B,S,F] gelu intermediate and the
        # pre-LN sum never reach HBM (ops/attn.py fused_mlp_ln).
        return fused_mlp_ln(
            x,
            layer["wi_kernel"].astype(compute_dtype),
            layer["wi_bias"].astype(compute_dtype),
            layer["wo_kernel"].astype(compute_dtype),
            layer["wo_bias"].astype(compute_dtype),
            layer["mlp_ln_scale"], layer["mlp_ln_bias"],
            c.layer_norm_eps)
    q = qkv[..., :H]
    k = qkv[..., H:2 * H].reshape(B, S, nh, hd)
    v = qkv[..., 2 * H:]
    if "lora_q_A" in layer:  # LoRA adapters on q/v (models/lora.py)
        def delta(a, b):
            h_low = jnp.dot(x, a.astype(compute_dtype), preferred_element_type=compute_dtype)
            return jnp.dot(h_low, b.astype(compute_dtype), preferred_element_type=compute_dtype)

        q = q + delta(layer["lora_q_A"], layer["lora_q_B"])
        v = v + delta(layer["lora_v_A"], layer["lora_v_B"])
    q = q.reshape(B, S, nh, hd)
    v = v.reshape(B, S, nh, hd)

    if attention == "flash":
        ctx = _flash_attention(q, k, v, seg_ids, hd)
    else:
        # Scores stay fp32: storing them in bf16 measured 22% faster on the
        # ISOLATED inner at S=156 on v5e but exactly 0% in-model (XLA already
        # fuses the score computation inside the layer scan), so the fp32
        # logits are kept — see BASELINE.md round-4 encoder profile.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        if tag_attn:
            # tag the [B,nh,S,S] tensor so remat="attn" recomputes ONLY it in
            # the backward pass: it dominates residual memory (stacked over
            # the layer scan, fp32, tile-padded 1.7x for S=156) at ~10%
            # recompute. Tagging is conditional because the name primitive is
            # not free under GSPMD+scan at full size (observed an XLA abort
            # when always-on).
            probs = checkpoint_name(probs, "attn_probs")
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=compute_dtype)
    ctx = ctx.reshape(B, S, H)

    attn_out = dense(ctx, layer["o_kernel"], layer["o_bias"])
    x = _layer_norm(x + attn_out, layer["attn_ln_scale"], layer["attn_ln_bias"], c.layer_norm_eps)

    h = dense(x, layer["wi_kernel"], layer["wi_bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = dense(h, layer["wo_kernel"], layer["wo_bias"])
    x = _layer_norm(x + h, layer["mlp_ln_scale"], layer["mlp_ln_bias"], c.layer_norm_eps)
    return x


def bert_encode(
    params: Params,
    config: BertConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat=False,
    attention: str = "xla",
) -> jax.Array:
    """Encoder forward. Returns last_hidden_state [B, S, H] in ``compute_dtype``.

    ``remat``: False | True/"full" (checkpoint whole blocks, ~33% recompute)
    | "attn" (selective: recompute only the attention score/prob tensors in
    the backward — most of full remat's memory win at ~10% recompute).

    ``attention``: "xla" (einsum + softmax; GSPMD-partitionable, the default)
    | "flash" (Pallas flash-attention kernel — never materializes the
    [B,nh,S,S] tensors in HBM; single-chip only: the pallas_call has no
    custom partitioning rule, so under a mesh GSPMD would replicate it.
    Falls back to "xla" off-TPU so CPU tests and virtual meshes keep one
    code path) | "fused" (two VMEM-resident encoder-block kernels,
    ops/attn.py; per-block single-chip, but the trainer routes encode
    through shard_map over the data axis on dp-only meshes —
    parallel/mesh.py:shard_steps)."""
    c = config
    B, S = input_ids.shape
    emb = params["embeddings"]

    x = jnp.take(emb["word"], input_ids, axis=0)
    pos_ids = jnp.arange(S)[None, :]
    x = x + jnp.take(emb["position"], pos_ids, axis=0)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    x = x + jnp.take(emb["token_type"], token_type_ids, axis=0)
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], c.layer_norm_eps)
    x = x.astype(compute_dtype)

    # additive mask bias, fp32: 0 where attended, -1e9 where padded
    mask_bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    seg_ids = attention_mask.astype(jnp.int32)

    if attention == "flash" and jax.default_backend() != "tpu":
        attention = "xla"
    block = partial(_encoder_block, config=c, compute_dtype=compute_dtype,
                    tag_attn=remat == "attn" and attention != "flash",
                    attention=attention)
    if remat == "attn":
        block = jax.checkpoint(
            block,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "attn_probs"),
        )
    elif remat:
        block = jax.checkpoint(block, static_argnums=())

    def scan_fn(h, layer):
        return block(h, layer, mask_bias, seg_ids), None

    x, _ = jax.lax.scan(scan_fn, x, params["layers"])
    return x


def bert_pooler(params: Params, hidden: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """HF-style pooler: tanh(dense(CLS)). Only used when feature='pooler_output'."""
    cls = hidden[:, 0, :]
    w = params["pooler"]["kernel"].astype(compute_dtype)
    b = params["pooler"]["bias"].astype(compute_dtype)
    return jnp.tanh(jnp.dot(cls, w, preferred_element_type=compute_dtype) + b)


# ---------------------------------------------------------------------------
# Persistence (numpy archive; HF-interop lives in hf_import.py)
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def save_params(params: Params, path: str, name: str = "weights") -> None:
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, f"{name}.npz"), **_flatten(params))


def load_params(path: str, name: str = "weights") -> Params:
    with np.load(os.path.join(path, f"{name}.npz")) as z:
        return _unflatten({k: z[k] for k in z.files})
