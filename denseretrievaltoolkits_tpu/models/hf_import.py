"""HF torch BERT checkpoint interop.

The reference loads towers with ``AutoModel.from_pretrained`` and saves them
with ``save_pretrained`` (``DRT/model/biencoder.py:205-206,226-241``).  Here we
convert between torch ``BertModel`` state dicts and our stacked-layer JAX
pytree, so users can start from any HF BERT checkpoint and export trained
towers back into the HF deploy format.

torch is used host-side only (CPU tensors → numpy); no torch op ever touches
the TPU compute path.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .bert import BertConfig, Params


def params_from_torch_state_dict(state_dict: Dict[str, Any], config: BertConfig) -> Params:
    """Convert a torch ``BertModel`` state_dict into our stacked-layer pytree."""
    import jax.numpy as jnp

    def t(name):  # torch Linear stores [out, in]; we store [in, out]
        return np.ascontiguousarray(np.asarray(state_dict[name].detach().cpu().numpy()).T)

    def a(name):
        return np.asarray(state_dict[name].detach().cpu().numpy())

    prefix = ""
    if not any(k.startswith("embeddings.") for k in state_dict):
        prefix = "bert."

    L = config.num_hidden_layers

    def stack(fmt, transpose):
        get = t if transpose else a
        return np.stack([get(prefix + fmt.format(i)) for i in range(L)])

    params: Params = {
        "embeddings": {
            "word": a(prefix + "embeddings.word_embeddings.weight"),
            "position": a(prefix + "embeddings.position_embeddings.weight"),
            "token_type": a(prefix + "embeddings.token_type_embeddings.weight"),
            "ln_scale": a(prefix + "embeddings.LayerNorm.weight"),
            "ln_bias": a(prefix + "embeddings.LayerNorm.bias"),
        },
        "layers": {
            "q_kernel": stack("encoder.layer.{}.attention.self.query.weight", True),
            "q_bias": stack("encoder.layer.{}.attention.self.query.bias", False),
            "k_kernel": stack("encoder.layer.{}.attention.self.key.weight", True),
            "k_bias": stack("encoder.layer.{}.attention.self.key.bias", False),
            "v_kernel": stack("encoder.layer.{}.attention.self.value.weight", True),
            "v_bias": stack("encoder.layer.{}.attention.self.value.bias", False),
            "o_kernel": stack("encoder.layer.{}.attention.output.dense.weight", True),
            "o_bias": stack("encoder.layer.{}.attention.output.dense.bias", False),
            "attn_ln_scale": stack("encoder.layer.{}.attention.output.LayerNorm.weight", False),
            "attn_ln_bias": stack("encoder.layer.{}.attention.output.LayerNorm.bias", False),
            "wi_kernel": stack("encoder.layer.{}.intermediate.dense.weight", True),
            "wi_bias": stack("encoder.layer.{}.intermediate.dense.bias", False),
            "wo_kernel": stack("encoder.layer.{}.output.dense.weight", True),
            "wo_bias": stack("encoder.layer.{}.output.dense.bias", False),
            "mlp_ln_scale": stack("encoder.layer.{}.output.LayerNorm.weight", False),
            "mlp_ln_bias": stack("encoder.layer.{}.output.LayerNorm.bias", False),
        },
    }
    pooler_w = prefix + "pooler.dense.weight"
    if pooler_w in state_dict:
        params["pooler"] = {"kernel": t(pooler_w), "bias": a(prefix + "pooler.dense.bias")}
    else:
        H = config.hidden_size
        params["pooler"] = {"kernel": np.zeros((H, H), np.float32), "bias": np.zeros((H,), np.float32)}

    import jax

    return jax.tree.map(jnp.asarray, params)


def params_from_pretrained(model_name_or_path: str, config: BertConfig = None):
    """Load an HF BERT checkpoint (hub id or local dir) into (params, config)."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_model = BertModel.from_pretrained(model_name_or_path)
    config = BertConfig.from_hf_config(hf_model.config)
    params = params_from_torch_state_dict(hf_model.state_dict(), config)
    return params, config


def params_to_torch_state_dict(params: Params, config: BertConfig) -> Dict[str, Any]:
    """Convert our pytree back to a torch ``BertModel`` state_dict."""
    import torch

    def tt(x):  # [in, out] -> torch [out, in]
        return torch.from_numpy(np.ascontiguousarray(np.asarray(x).T.astype(np.float32)))

    def ta(x):
        return torch.from_numpy(np.asarray(x).astype(np.float32))

    emb, layers = params["embeddings"], params["layers"]
    sd: Dict[str, Any] = {
        "embeddings.word_embeddings.weight": ta(emb["word"]),
        "embeddings.position_embeddings.weight": ta(emb["position"]),
        "embeddings.token_type_embeddings.weight": ta(emb["token_type"]),
        "embeddings.LayerNorm.weight": ta(emb["ln_scale"]),
        "embeddings.LayerNorm.bias": ta(emb["ln_bias"]),
        "pooler.dense.weight": tt(params["pooler"]["kernel"]),
        "pooler.dense.bias": ta(params["pooler"]["bias"]),
    }
    mapping = [
        ("q_kernel", "attention.self.query.weight", True),
        ("q_bias", "attention.self.query.bias", False),
        ("k_kernel", "attention.self.key.weight", True),
        ("k_bias", "attention.self.key.bias", False),
        ("v_kernel", "attention.self.value.weight", True),
        ("v_bias", "attention.self.value.bias", False),
        ("o_kernel", "attention.output.dense.weight", True),
        ("o_bias", "attention.output.dense.bias", False),
        ("attn_ln_scale", "attention.output.LayerNorm.weight", False),
        ("attn_ln_bias", "attention.output.LayerNorm.bias", False),
        ("wi_kernel", "intermediate.dense.weight", True),
        ("wi_bias", "intermediate.dense.bias", False),
        ("wo_kernel", "output.dense.weight", True),
        ("wo_bias", "output.dense.bias", False),
        ("mlp_ln_scale", "output.LayerNorm.weight", False),
        ("mlp_ln_bias", "output.LayerNorm.bias", False),
    ]
    for i in range(config.num_hidden_layers):
        for ours, theirs, transpose in mapping:
            x = np.asarray(layers[ours][i])
            sd[f"encoder.layer.{i}.{theirs}"] = tt(x) if transpose else ta(x)
    return sd


def save_pretrained_hf(params: Params, config: BertConfig, output_dir: str) -> None:
    """Export to HF deploy format via a host-side torch BertModel."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_config = HFBertConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        intermediate_size=config.intermediate_size,
        max_position_embeddings=config.max_position_embeddings,
        type_vocab_size=config.type_vocab_size,
        layer_norm_eps=config.layer_norm_eps,
        pad_token_id=config.pad_token_id,
    )
    model = BertModel(hf_config)
    model.load_state_dict(params_to_torch_state_dict(params, config), strict=False)
    model.save_pretrained(output_dir)
