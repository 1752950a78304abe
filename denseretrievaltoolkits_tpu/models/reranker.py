"""Cross-encoder reranker (RRModel), TPU-native.

Functional re-design of the reference reranker (``DRT/model/reranker.py:34-186``):
one encoder tower scores joined (query, passage) pairs; BERT-style path pools
the hidden states and projects with a LinearHead(dim, 1) (reranker.py:121-129).
The T5 token-logit scoring path (pos_token/neg_token logits at decoder step 0,
reranker.py:115-119) is wired through the same spec fields and activates with
the T5 backbone (models/t5.py).

Pairwise losses mr/smr/bce/ce come from train/losses.py (reference
``rr_loss_functions``, losses.py:83-88).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..train.losses import rr_loss_functions
from . import bert, linear
from .pooling import pool

MANIFEST = "openmatch_config.json"


def _compute_dtype(name: str):
    return {"float32": jnp.float32, "float16": jnp.float16, "bfloat16": jnp.bfloat16}[name]


@dataclass(frozen=True)
class RRModelSpec:
    bert_config: bert.BertConfig
    feature: str = "last_hidden_state"
    pooling: str = "first"
    pos_token: Optional[str] = None
    neg_token: Optional[str] = None
    loss_fn: str = "mr"
    margin: float = 1.0
    dtype: str = "float32"
    remat: bool = False
    backbone: str = "bert"


class RRModel:
    def __init__(self, spec: RRModelSpec):
        self.spec = spec
        self.loss_fn = rr_loss_functions[spec.loss_fn]

    def init_params(self, rng: jax.Array, projection_in_dim: int = None) -> Dict[str, Any]:
        k_lm, k_head = jax.random.split(rng)
        in_dim = projection_in_dim or self.spec.bert_config.hidden_size
        return {
            "lm": bert.init_params(k_lm, self.spec.bert_config),
            "head": linear.init_head(k_head, in_dim, 1),
        }

    def encode(self, params, items: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Score joined (q, d) pairs → [B, 1] (reference reranker.py:111-130)."""
        spec = self.spec
        dtype = _compute_dtype(spec.dtype)
        hidden = bert.bert_encode(
            params["lm"],
            spec.bert_config,
            items["input_ids"],
            items["attention_mask"],
            items.get("token_type_ids"),
            compute_dtype=dtype,
            remat=spec.remat,
        )
        if spec.pooling not in ("first", "mean"):
            raise ValueError(f"Unknown pooling type: {spec.pooling}")
        reps = pool(hidden, items["attention_mask"], spec.pooling).astype(jnp.float32)
        return linear.apply_head(params["head"], reps)

    def forward(
        self,
        params,
        pos_pairs: Optional[Dict[str, jnp.ndarray]] = None,
        neg_pairs: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Pairwise training forward (reference reranker.py:87-109).

        With only pos_pairs: returns scores (the eval path, trainer.py:413-420).
        Shape-mismatched pos/neg (e.g. n-1 negatives per positive with n>2)
        broadcasts the positive score over each query's negatives."""
        out: Dict[str, jnp.ndarray] = {}
        pos_scores = self.encode(params, pos_pairs) if pos_pairs is not None else None
        if pos_pairs is not None:
            out["pos_pair_scores"] = pos_scores
        if neg_pairs is None:
            return out
        neg_scores = self.encode(params, neg_pairs)
        out["neg_pair_scores"] = neg_scores

        n_pos, n_neg = pos_scores.shape[0], neg_scores.shape[0]
        if n_neg % n_pos == 0 and n_neg != n_pos:
            reps = n_neg // n_pos
            pos_b = jnp.repeat(pos_scores, reps, axis=0)
        else:
            pos_b = pos_scores
        if pos_b.shape == neg_scores.shape:
            out["loss"] = self.loss_fn(pos_b, neg_scores, self.spec.margin)
        return out

    # -- persistence ---------------------------------------------------------

    def _manifest(self):
        return {
            "plm_backbone": {"type": self.spec.backbone, "feature": self.spec.feature},
            "pooling": self.spec.pooling,
            "pos_token": self.spec.pos_token,
            "neg_token": self.spec.neg_token,
        }

    def save(self, params, output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        bert.save_params(params["lm"], output_dir)
        bert.save_config(self.spec.bert_config, output_dir)
        linear.save_head(params["head"], output_dir)
        with open(os.path.join(output_dir, MANIFEST), "w") as fh:
            json.dump(self._manifest(), fh, indent=4)

    @classmethod
    def build(
        cls,
        model_args,
        data_args=None,
        train_args=None,
        tokenizer=None,
        rng: Optional[jax.Array] = None,
        bert_config: Optional[bert.BertConfig] = None,
    ):
        """Build from our checkpoint dir, an HF checkpoint, or random init
        (reference reranker.py:132-179)."""
        path = model_args.model_name_or_path
        manifest = None
        if path and os.path.isdir(path) and os.path.exists(os.path.join(path, MANIFEST)):
            with open(os.path.join(path, MANIFEST)) as fh:
                manifest = json.load(fh)

        loss_fn = getattr(train_args, "loss_fn", "mr") if train_args else "mr"
        margin = getattr(train_args, "margin", 1.0) if train_args else 1.0

        if manifest is not None:
            config = bert.load_config(path)
            params = {"lm": bert.load_params(path), "head": linear.load_head(path)}
            spec = RRModelSpec(
                bert_config=config,
                feature=manifest["plm_backbone"]["feature"],
                pooling=manifest["pooling"],
                pos_token=manifest.get("pos_token"),
                neg_token=manifest.get("neg_token"),
                loss_fn=loss_fn,
                margin=margin,
                dtype=getattr(model_args, "dtype", "float32"),
                remat=getattr(model_args, "remat", False),
            )
            return cls(spec), params

        rng = rng if rng is not None else jax.random.key(0)
        if path and os.path.isdir(path) and os.path.exists(
            os.path.join(path, "bert_config.json")
        ) and not os.path.exists(os.path.join(path, "weights.npz")):
            # architecture-only dir: random init from the config (offline path)
            config = bert.load_config(path)
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)
        elif path and (os.path.isdir(path) or "/" in path or path.startswith("bert")):
            from .hf_import import params_from_pretrained

            lm_params, config = params_from_pretrained(path)
        else:
            config = bert_config or bert.BertConfig()
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)

        spec = RRModelSpec(
            bert_config=config,
            feature=model_args.feature,
            pooling=model_args.pooling,
            pos_token=model_args.pos_token,
            neg_token=model_args.neg_token,
            loss_fn=loss_fn,
            margin=margin,
            dtype=model_args.dtype,
            remat=getattr(model_args, "remat", False),
        )
        # the head maps pooled hidden states → 1 score, so its input dim is the
        # encoder hidden size (the reference's projection_in_dim default of 768
        # only coincides with bert-base, reranker.py:165)
        params = {
            "lm": lm_params,
            "head": linear.init_head(jax.random.fold_in(rng, 1), config.hidden_size, 1),
        }
        return cls(spec), params
