"""T5 backbones inside DRModel / RRModel: forward, scoring, save/load."""

import dataclasses

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.models.reranker import RRModel, RRModelSpec
from denseretrievaltoolkits_tpu.models.t5 import T5Config

TINY_T5 = T5Config(
    vocab_size=120,
    d_model=32,
    d_kv=8,
    d_ff=48,
    num_layers=2,
    num_heads=4,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=20,
)


def _batch(rng, n, seq):
    return {
        "input_ids": rng.integers(2, 120, size=(n, seq)).astype(np.int32),
        "attention_mask": np.ones((n, seq), np.int32),
    }


def test_t5_encoder_biencoder_forward():
    spec = DRModelSpec(bert_config=TINY_T5, backbone="t5", pooling="mean")
    model = DRModel(spec)
    import denseretrievaltoolkits_tpu.models.t5 as t5

    params = {"lm_q": t5.init_params(jax.random.key(0), TINY_T5)}
    rng = np.random.default_rng(0)
    out = model.forward(params, _batch(rng, 2, 8), _batch(rng, 4, 12))
    assert out["scores"].shape == (2, 4)
    assert out["q_reps"].shape == (2, 32)
    assert np.isfinite(float(out["loss"]))


def test_t5_full_biencoder_reps():
    spec = DRModelSpec(bert_config=TINY_T5, backbone="t5_full")
    model = DRModel(spec)
    import denseretrievaltoolkits_tpu.models.t5 as t5

    params = {"lm_q": t5.init_params(jax.random.key(0), TINY_T5, with_decoder=True)}
    rng = np.random.default_rng(1)
    reps = np.asarray(model.encode_query(params, _batch(rng, 3, 8)))
    assert reps.shape == (3, 32) and np.isfinite(reps).all()


def test_t5_full_reranker_token_scores_and_loss():
    spec = RRModelSpec(
        bert_config=TINY_T5, backbone="t5_full",
        pos_token="yes", neg_token="no", pos_token_id=7, neg_token_id=8,
    )
    model = RRModel(spec)
    assert model.spec.loss_fn == "ce"  # forced for full-T5 (reranker.py:71-73)
    params = model.init_params(jax.random.key(0))
    assert "head" not in params
    rng = np.random.default_rng(2)
    out = model.forward(params, _batch(rng, 2, 10), _batch(rng, 2, 10))
    assert out["pos_pair_scores"].shape == (2, 2)  # [neg, pos] logits
    assert np.isfinite(float(out["loss"]))


def test_t5_biencoder_save_load_roundtrip(tmp_path):
    spec = DRModelSpec(bert_config=TINY_T5, backbone="t5", pooling="mean")
    model = DRModel(spec)
    import denseretrievaltoolkits_tpu.models.t5 as t5

    params = {"lm_q": t5.init_params(jax.random.key(0), TINY_T5)}
    out_dir = str(tmp_path / "t5ckpt")
    model.save(params, out_dir)

    margs = dataclasses.make_dataclass(
        "M", [("model_name_or_path", str), ("dtype", str, dataclasses.field(default="float32"))]
    )(out_dir)
    model2, params2 = DRModel.build(margs)
    assert model2.spec.backbone == "t5"
    rng = np.random.default_rng(3)
    b = _batch(rng, 2, 8)
    np.testing.assert_allclose(
        np.asarray(model.encode_query(params, b)),
        np.asarray(model2.encode_query(params2, b)),
        atol=1e-6,
    )


def test_t5_arch_only_build(tmp_path):
    import denseretrievaltoolkits_tpu.models.t5 as t5

    arch = str(tmp_path / "arch")
    t5.save_config(TINY_T5, arch)
    margs = dataclasses.make_dataclass(
        "M",
        [
            ("model_name_or_path", str),
            ("dtype", str, dataclasses.field(default="float32")),
            ("encoder_only", bool, dataclasses.field(default=True)),
            ("untie_encoder", bool, dataclasses.field(default=False)),
            ("feature", str, dataclasses.field(default="last_hidden_state")),
            ("pooling", str, dataclasses.field(default="mean")),
            ("add_linear_head", bool, dataclasses.field(default=False)),
            ("normalize", bool, dataclasses.field(default=False)),
        ],
    )(arch)
    model, params = DRModel.build(margs, rng=jax.random.key(0))
    assert model.spec.backbone == "t5"
    rng = np.random.default_rng(4)
    reps = np.asarray(model.encode_query(params, _batch(rng, 2, 8)))
    assert reps.shape == (2, 32)
