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

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..train.losses import rr_loss_functions
from . import bert, linear, t5
from .pooling import pool

MANIFEST = "openmatch_config.json"


def _compute_dtype(name: str):
    return {"float32": jnp.float32, "float16": jnp.float16, "bfloat16": jnp.bfloat16}[name]


@dataclass(frozen=True)
class RRModelSpec:
    bert_config: object  # BertConfig or T5Config, per backbone
    feature: str = "last_hidden_state"
    pooling: str = "first"
    pos_token: Optional[str] = None
    neg_token: Optional[str] = None
    pos_token_id: Optional[int] = None
    neg_token_id: Optional[int] = None
    loss_fn: str = "mr"
    margin: float = 1.0
    dtype: str = "float32"
    remat: bool = False
    backbone: str = "bert"  # "bert" | "t5" (encoder-only) | "t5_full" (token scoring)


class RRModel:
    def __init__(self, spec: RRModelSpec):
        # a full-T5 token-scoring reranker always trains with the 2-way CE loss
        # (reference reranker.py:71-73)
        if spec.backbone == "t5_full":
            spec = dataclasses.replace(spec, loss_fn="ce")
        self.spec = spec
        self.loss_fn = rr_loss_functions[spec.loss_fn]

    def init_params(self, rng: jax.Array, projection_in_dim: int = None) -> Dict[str, Any]:
        k_lm, k_head = jax.random.split(rng)
        if self.spec.backbone in ("t5", "t5_full"):
            lm = t5.init_params(
                k_lm, self.spec.bert_config,
                with_decoder=self.spec.backbone == "t5_full",
            )
            hidden = self.spec.bert_config.d_model
        else:
            lm = bert.init_params(k_lm, self.spec.bert_config)
            hidden = self.spec.bert_config.hidden_size
        params = {"lm": lm}
        if self.spec.backbone != "t5_full":
            params["head"] = linear.init_head(k_head, projection_in_dim or hidden, 1)
        return params

    def encode(self, params, items: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Score joined (q, d) pairs → [B, 1] (BERT/T5-encoder pooled-head) or
        [B, 2] ([neg, pos] token logits, full-T5) — reference reranker.py:111-130."""
        spec = self.spec
        dtype = _compute_dtype(spec.dtype)
        if spec.backbone == "t5_full":
            enc = t5.t5_encode(
                params["lm"], spec.bert_config,
                items["input_ids"], items["attention_mask"],
                compute_dtype=dtype, remat=spec.remat,
            )
            logits = t5.t5_decode_step0(
                params["lm"], spec.bert_config, enc, items["attention_mask"],
                compute_dtype=dtype,
            )
            return logits[:, jnp.array([spec.neg_token_id, spec.pos_token_id])]
        if spec.backbone == "t5":
            hidden = t5.t5_encode(
                params["lm"], spec.bert_config,
                items["input_ids"], items["attention_mask"],
                compute_dtype=dtype, remat=spec.remat,
            )
        else:
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
        bert.save_params(params["lm"], output_dir)  # flat npz works for any pytree
        if self.spec.backbone in ("t5", "t5_full"):
            t5.save_config(self.spec.bert_config, output_dir)
        else:
            bert.save_config(self.spec.bert_config, output_dir)
        if "head" in params:
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
            backbone = manifest["plm_backbone"].get("type", "bert")
            if backbone in ("t5", "t5_full"):
                config = t5.load_config(path)
            else:
                config = bert.load_config(path)
            params = {"lm": bert.load_params(path)}
            if backbone != "t5_full":
                params["head"] = linear.load_head(path)
            pos_tok = manifest.get("pos_token")
            neg_tok = manifest.get("neg_token")
            spec = RRModelSpec(
                bert_config=config,
                backbone=backbone,
                pos_token_id=(tokenizer.encode(pos_tok, add_special_tokens=False)[0]
                              if pos_tok and tokenizer else None),
                neg_token_id=(tokenizer.encode(neg_tok, add_special_tokens=False)[0]
                              if neg_tok and tokenizer else None),
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
        # backbone selection mirrors reference reranker.py:143-150: encoder_only
        # -> T5EncoderModel; a T5 architecture -> T5ForConditionalGeneration
        # token scoring; otherwise BERT.
        backbone = "bert"
        arch_only = (
            path and os.path.isdir(path)
            and not os.path.exists(os.path.join(path, "weights.npz"))
        )
        if arch_only and os.path.exists(os.path.join(path, "t5_config.json")):
            config = t5.load_config(path)
            backbone = "t5" if model_args.encoder_only else "t5_full"
            lm_params = t5.init_params(
                jax.random.fold_in(rng, 0), config,
                with_decoder=backbone == "t5_full",
            )
        elif arch_only and os.path.exists(os.path.join(path, "bert_config.json")):
            config = bert.load_config(path)
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)
        elif path and (os.path.isdir(path) or "/" in path or path.startswith("bert")
                       or "t5" in path):
            if "t5" in path.lower():
                backbone = "t5" if model_args.encoder_only else "t5_full"
                if backbone == "t5":
                    from transformers import T5EncoderModel

                    hf = T5EncoderModel.from_pretrained(path)
                else:
                    from transformers import T5ForConditionalGeneration

                    hf = T5ForConditionalGeneration.from_pretrained(path)
                config = t5.T5Config.from_hf_config(hf.config)
                lm_params = t5.params_from_torch_state_dict(
                    hf.state_dict(), config, with_decoder=backbone == "t5_full"
                )
            else:
                from .hf_import import params_from_pretrained

                lm_params, config = params_from_pretrained(path)
        else:
            config = bert_config or bert.BertConfig()
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)

        def tok_id(token):
            if token is None or tokenizer is None:
                return None
            return tokenizer.encode(token, add_special_tokens=False)[0]

        spec = RRModelSpec(
            bert_config=config,
            backbone=backbone,
            feature=model_args.feature,
            pooling=model_args.pooling,
            pos_token=model_args.pos_token,
            neg_token=model_args.neg_token,
            pos_token_id=tok_id(model_args.pos_token),
            neg_token_id=tok_id(model_args.neg_token),
            loss_fn=loss_fn,
            margin=margin,
            dtype=model_args.dtype,
            remat=getattr(model_args, "remat", False),
        )
        params = {"lm": lm_params}
        if backbone != "t5_full":
            # the head maps pooled hidden states → 1 score, so its input dim is
            # the encoder hidden size (the reference's projection_in_dim default
            # of 768 only coincides with bert-base, reranker.py:165)
            hidden = config.d_model if backbone == "t5" else config.hidden_size
            params["head"] = linear.init_head(jax.random.fold_in(rng, 1), hidden, 1)
        return cls(spec), params
