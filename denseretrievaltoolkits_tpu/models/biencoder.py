"""DPR-style dual encoder (DRModel), TPU-native.

Functional re-design of the reference biencoder (``DRT/model/biencoder.py:36-285``):
the model object holds only *static* configuration; parameters are an explicit
pytree argument to every method, so ``forward`` jits/pjits cleanly and the same
object drives training, corpus encoding, and inference.

Capability parity:
- tied/untied q/p towers (`untie_encoder`, biencoder.py:204-209)
- optional bias-free LinearHead projections (biencoder.py:147-148)
- first/mean/max pooling + optional L2 normalize (biencoder.py:139-150)
- contrastive loss with stride targets computed inside forward (biencoder.py:107-116)
- save/load with the ``openmatch_config.json`` manifest layout (biencoder.py:171-241)

Cross-device negative sharing (``negatives_x_device``/``dist_gather_tensor``,
biencoder.py:103-105,243-254) has no explicit code here: the loss is written
over the global batch and GSPMD inserts the all_gather when the batch is
sharded over the data axis (see parallel/mesh.py and train/trainer.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..train.losses import contrastive_loss
from . import bert, linear, t5
from .pooling import l2_normalize, pool

MANIFEST = "openmatch_config.json"


def _compute_dtype(name: str):
    return {"float32": jnp.float32, "float16": jnp.float16, "bfloat16": jnp.bfloat16}[name]


@dataclass(frozen=True)
class DRModelSpec:
    """Static model configuration (everything jit can close over)."""

    bert_config: bert.BertConfig
    tied: bool = True
    feature: str = "last_hidden_state"
    pooling: str = "first"
    linear_head: bool = False
    normalize: bool = False
    dtype: str = "float32"
    remat: bool = False
    backbone: str = "bert"  # "bert" | "t5" (encoder tower) | "t5_full" (enc+dec step-0 reps)
    fused_loss: bool = False  # Pallas fused similarity+CE kernel (ops/contrastive.py)
    attention: str = "xla"  # "xla" | "flash" | "fused" (Pallas; single-chip, bert only)

    def __post_init__(self):
        # Fail at build time, not first trace (reference raises in pooling
        # dispatch, DRT/model/biencoder.py:139-146).
        if self.pooling not in ("first", "mean", "max"):
            raise ValueError(f"Unknown pooling type: {self.pooling}")
        if self.backbone not in ("bert", "t5", "t5_full"):
            raise ValueError(f"Unknown backbone: {self.backbone}")
        if self.attention not in ("xla", "flash", "fused"):
            raise ValueError(f"Unknown attention impl: {self.attention}")


class DRModel:
    """Dual encoder. Methods are pure in (params, batch) — safe under jit/pjit."""

    def __init__(self, spec: DRModelSpec):
        self.spec = spec

    # -- parameter construction -------------------------------------------

    def init_params(self, rng: jax.Array, projection_in_dim: int = None,
                    projection_out_dim: int = None) -> Dict[str, Any]:
        spec = self.spec
        k_q, k_p, k_hq, k_hp = jax.random.split(rng, 4)
        params: Dict[str, Any] = {"lm_q": bert.init_params(k_q, spec.bert_config)}
        if not spec.tied:
            params["lm_p"] = bert.init_params(k_p, spec.bert_config)
        if spec.linear_head:
            in_dim = projection_in_dim or spec.bert_config.hidden_size
            out_dim = projection_out_dim or spec.bert_config.hidden_size
            params["head_q"] = linear.init_head(k_hq, in_dim, out_dim)
            if not spec.tied:
                params["head_p"] = linear.init_head(k_hp, in_dim, out_dim)
        return params

    # -- encoding -----------------------------------------------------------

    def _encode(self, lm_params, head_params, batch: Dict[str, jnp.ndarray]):
        spec = self.spec
        dtype = _compute_dtype(spec.dtype)
        if spec.backbone in ("t5", "t5_full"):
            hidden = t5.t5_encode(
                lm_params, spec.bert_config,
                batch["input_ids"], batch["attention_mask"],
                compute_dtype=dtype, remat=spec.remat,
            )
            if spec.backbone == "t5_full":
                # full-T5 rep: decoder step-0 hidden (reference biencoder.py:131-135)
                reps = t5.t5_decode_step0(
                    lm_params, spec.bert_config, hidden, batch["attention_mask"],
                    compute_dtype=dtype, return_logits=False,
                )
            else:
                reps = pool(hidden, batch["attention_mask"], spec.pooling)
        else:
            hidden = bert.bert_encode(
                lm_params,
                spec.bert_config,
                batch["input_ids"],
                batch["attention_mask"],
                batch.get("token_type_ids"),
                compute_dtype=dtype,
                remat=spec.remat,
                attention=spec.attention,
            )
            if spec.feature == "pooler_output":
                reps = bert.bert_pooler(lm_params, hidden, compute_dtype=dtype)
            else:
                reps = pool(hidden, batch["attention_mask"], spec.pooling)
        if head_params is not None:
            reps = linear.apply_head(head_params, reps)
        reps = reps.astype(jnp.float32)
        if spec.normalize:
            reps = l2_normalize(reps)
        return reps

    def encode_query(self, params, query: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self._encode(params["lm_q"], params.get("head_q"), query)

    def encode_passage(self, params, passage: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        lm = params["lm_q"] if self.spec.tied else params["lm_p"]
        head_key = "head_q" if self.spec.tied else "head_p"
        return self._encode(lm, params.get(head_key), passage)

    # -- training forward -----------------------------------------------------

    def forward(
        self,
        params,
        query: Optional[Dict[str, jnp.ndarray]] = None,
        passage: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Encode and, when both sides are present, compute the contrastive loss.

        Mirrors ``DRModel.forward`` (biencoder.py:88-125): encode-only calls
        return just the reps; training calls return loss + score matrix.
        """
        out: Dict[str, jnp.ndarray] = {}
        if query is not None:
            out["q_reps"] = self.encode_query(params, query)
        if passage is not None:
            out["p_reps"] = self.encode_passage(params, passage)
        if query is None or passage is None:
            return out
        if self.spec.fused_loss:
            from ..ops.contrastive import contrastive_loss_auto

            loss, scores = contrastive_loss_auto(out["q_reps"], out["p_reps"])
        else:
            loss, scores = contrastive_loss(out["q_reps"], out["p_reps"])
        out["loss"] = loss
        if scores is not None:  # the fused kernel never materializes them
            out["scores"] = scores
        return out

    # -- persistence ---------------------------------------------------------

    def _manifest(self) -> Dict[str, Any]:
        # Same manifest schema as the reference (biencoder.py:75-86).
        return {
            "tied": self.spec.tied,
            "plm_backbone": {"type": self.spec.backbone, "feature": self.spec.feature},
            "pooling": self.spec.pooling,
            "linear_head": self.spec.linear_head,
            "normalize": self.spec.normalize,
            "dtype": self.spec.dtype,
        }

    def save(self, params, output_dir: str) -> None:
        """Save in the reference's directory layout (biencoder.py:226-241)."""
        os.makedirs(output_dir, exist_ok=True)
        save_cfg = (
            t5.save_config if self.spec.backbone in ("t5", "t5_full") else bert.save_config
        )
        if not self.spec.tied:
            qdir = os.path.join(output_dir, "query_model")
            pdir = os.path.join(output_dir, "passage_model")
            bert.save_params(params["lm_q"], qdir)
            save_cfg(self.spec.bert_config, qdir)
            bert.save_params(params["lm_p"], pdir)
            save_cfg(self.spec.bert_config, pdir)
            if self.spec.linear_head:
                linear.save_head(params["head_q"], os.path.join(output_dir, "query_head"))
                linear.save_head(params["head_p"], os.path.join(output_dir, "passage_head"))
        else:
            bert.save_params(params["lm_q"], output_dir)
            save_cfg(self.spec.bert_config, output_dir)
            if self.spec.linear_head:
                linear.save_head(params["head_q"], output_dir)
        with open(os.path.join(output_dir, MANIFEST), "w") as fh:
            json.dump(self._manifest(), fh, indent=4)

    def export_hf(self, params, output_dir: str) -> None:
        """Export towers to the HF torch deploy format."""
        from .hf_import import save_pretrained_hf

        if self.spec.tied:
            save_pretrained_hf(params["lm_q"], self.spec.bert_config, output_dir)
        else:
            save_pretrained_hf(params["lm_q"], self.spec.bert_config,
                               os.path.join(output_dir, "query_model"))
            save_pretrained_hf(params["lm_p"], self.spec.bert_config,
                               os.path.join(output_dir, "passage_model"))

    def encode_only_forward(self, params, query=None, passage=None):
        """Encode-only forward: reps, never a loss (the inference contract of
        the reference's ``DRModelForInference.forward``, biencoder.py:278-285)."""
        out = {}
        if query is not None:
            out["q_reps"] = self.encode_query(params, query)
        if passage is not None:
            out["p_reps"] = self.encode_passage(params, passage)
        return out

    @classmethod
    def build(
        cls,
        model_args,
        rng: Optional[jax.Array] = None,
        bert_config: Optional[bert.BertConfig] = None,
    ) -> Tuple["DRModel", Dict[str, Any]]:
        """Build from a saved checkpoint dir, an HF checkpoint, or random init.

        Mirrors ``DRModel.build`` (biencoder.py:159-224): a dir containing
        ``openmatch_config.json`` is one of ours; otherwise treat the path as an
        HF checkpoint; otherwise random-init from ``bert_config``.
        """
        path = model_args.model_name_or_path
        manifest = None
        if path and os.path.isdir(path) and os.path.exists(os.path.join(path, MANIFEST)):
            with open(os.path.join(path, MANIFEST)) as fh:
                manifest = json.load(fh)

        if manifest is not None:
            tied = manifest["tied"]
            backbone = manifest["plm_backbone"].get("type", "bert")
            load_cfg = t5.load_config if backbone in ("t5", "t5_full") else bert.load_config
            if tied:
                config = load_cfg(path)
                params = {"lm_q": bert.load_params(path)}
                if manifest["linear_head"]:
                    params["head_q"] = linear.load_head(path)
            else:
                qdir = os.path.join(path, "query_model")
                pdir = os.path.join(path, "passage_model")
                config = load_cfg(qdir)
                params = {"lm_q": bert.load_params(qdir), "lm_p": bert.load_params(pdir)}
                if manifest["linear_head"]:
                    params["head_q"] = linear.load_head(os.path.join(path, "query_head"))
                    params["head_p"] = linear.load_head(os.path.join(path, "passage_head"))
            spec = DRModelSpec(
                bert_config=config,
                tied=tied,
                backbone=backbone,
                feature=manifest["plm_backbone"]["feature"],
                pooling=manifest["pooling"],
                linear_head=manifest["linear_head"],
                normalize=manifest["normalize"],
                dtype=getattr(model_args, "dtype", manifest.get("dtype", "float32")),
                remat=getattr(model_args, "remat", False),
                fused_loss=getattr(model_args, "fused_loss", False),
                attention=getattr(model_args, "attention", "xla"),
            )
            return cls(spec), params

        tied = not model_args.untie_encoder
        backbone = "bert"
        rng = rng if rng is not None else jax.random.key(0)
        arch_only = (
            path and os.path.isdir(path)
            and not os.path.exists(os.path.join(path, "weights.npz"))
        )
        if arch_only and os.path.exists(os.path.join(path, "t5_config.json")):
            # architecture-only T5 dir: random init (offline path)
            config = t5.load_config(path)
            backbone = "t5" if model_args.encoder_only else "t5_full"
            lm_params = t5.init_params(
                jax.random.fold_in(rng, 0), config,
                with_decoder=backbone == "t5_full",
            )
        elif arch_only and os.path.exists(os.path.join(path, "bert_config.json")):
            # architecture-only dir: random init from the config (offline path)
            config = bert.load_config(path)
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)
        elif path and "t5" in path.lower() and (os.path.isdir(path) or "/" in path):
            # HF T5 checkpoint; encoder_only picks the encoder tower
            # (reference biencoder.py:169: T5EncoderModel vs AutoModel)
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
        elif path and (os.path.isdir(path) or "/" in path or path.startswith("bert")):
            # HF checkpoint (hub id or local save_pretrained dir)
            from .hf_import import params_from_pretrained

            lm_params, config = params_from_pretrained(path)
        else:
            config = bert_config or bert.BertConfig()
            rng = rng if rng is not None else jax.random.key(0)
            lm_params = bert.init_params(jax.random.fold_in(rng, 0), config)

        spec = DRModelSpec(
            bert_config=config,
            tied=tied,
            backbone=backbone,
            feature=model_args.feature,
            pooling=model_args.pooling,
            linear_head=model_args.add_linear_head,
            normalize=model_args.normalize,
            dtype=model_args.dtype,
            remat=getattr(model_args, "remat", False),
            fused_loss=getattr(model_args, "fused_loss", False),
            attention=getattr(model_args, "attention", "xla"),
        )
        model = cls(spec)
        if getattr(model_args, "param_efficient_method", None) == "lora" and backbone in ("bert", "t5"):
            from .lora import add_lora

            lm_params = add_lora(
                lm_params, jax.random.fold_in(rng, 2),
                rank=getattr(model_args, "lora_rank", 8),
            )
        params: Dict[str, Any] = {"lm_q": lm_params}
        if not tied:
            params["lm_p"] = jax.tree.map(jnp.copy, lm_params)
        if spec.linear_head:
            k_hq, k_hp = jax.random.split(jax.random.fold_in(rng, 1))
            params["head_q"] = linear.init_head(
                k_hq, model_args.projection_in_dim, model_args.projection_out_dim
            )
            if not tied:
                params["head_p"] = linear.init_head(
                    k_hp, model_args.projection_in_dim, model_args.projection_out_dim
                )
        return model, params


class DRModelForInference(DRModel):
    """Encode-only variant (reference ``DRModelForInference``,
    biencoder.py:264-285).  In the functional design there are no grad-mode
    toggles — ``forward`` here simply never computes a loss."""

    def forward(self, params, query=None, passage=None):
        return self.encode_only_forward(params, query, passage)
