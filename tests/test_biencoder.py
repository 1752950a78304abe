"""DRModel: forward semantics, tied/untied, heads, normalize, save/load."""

import dataclasses

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

TINY = BertConfig(
    vocab_size=97,
    hidden_size=16,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=37,
    max_position_embeddings=48,
)


def _batch(rng, n, seq, vocab):
    return {
        "input_ids": rng.integers(1, vocab, size=(n, seq)).astype(np.int32),
        "attention_mask": np.ones((n, seq), np.int32),
    }


@pytest.fixture(scope="module")
def model_and_params():
    spec = DRModelSpec(bert_config=TINY)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0))
    return model, params


def test_forward_loss_and_scores(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    out = model.forward(params, _batch(rng, 2, 8, 97), _batch(rng, 4, 12, 97))
    assert out["scores"].shape == (2, 4)
    assert out["q_reps"].shape == (2, 16)
    assert out["p_reps"].shape == (4, 16)
    assert np.isfinite(float(out["loss"]))
    # encode-only paths return no loss (biencoder.py:96-100 semantics)
    out_q = model.forward(params, query=_batch(rng, 2, 8, 97))
    assert "loss" not in out_q and "q_reps" in out_q


def test_tied_encoders_share_weights(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(1)
    batch = _batch(rng, 3, 8, 97)
    q = np.asarray(model.encode_query(params, batch))
    p = np.asarray(model.encode_passage(params, batch))
    np.testing.assert_allclose(q, p, atol=1e-6)


def test_untied_encoders_differ():
    spec = DRModelSpec(bert_config=TINY, tied=False)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    batch = _batch(rng, 3, 8, 97)
    q = np.asarray(model.encode_query(params, batch))
    p = np.asarray(model.encode_passage(params, batch))
    assert np.abs(q - p).max() > 1e-3


def test_normalize():
    spec = DRModelSpec(bert_config=TINY, normalize=True)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(2)
    reps = np.asarray(model.encode_query(params, _batch(rng, 4, 8, 97)))
    np.testing.assert_allclose(np.linalg.norm(reps, axis=1), 1.0, atol=1e-5)


def test_linear_head_projection():
    spec = DRModelSpec(bert_config=TINY, linear_head=True)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0), projection_in_dim=16, projection_out_dim=8)
    rng = np.random.default_rng(3)
    reps = np.asarray(model.encode_query(params, _batch(rng, 4, 8, 97)))
    assert reps.shape == (4, 8)


@pytest.mark.parametrize("pooling", ["first", "mean", "max"])
def test_pooling_modes(pooling):
    spec = DRModelSpec(bert_config=TINY, pooling=pooling)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(4)
    reps = np.asarray(model.encode_query(params, _batch(rng, 2, 8, 97)))
    assert reps.shape == (2, 16) and np.isfinite(reps).all()


@pytest.mark.parametrize("tied,linear_head", [(True, False), (True, True), (False, True)])
def test_save_load_roundtrip(tmp_path, tied, linear_head):
    spec = DRModelSpec(bert_config=TINY, tied=tied, linear_head=linear_head)
    model = DRModel(spec)
    params = model.init_params(jax.random.key(0), 16, 8)
    out_dir = str(tmp_path / "ckpt")
    model.save(params, out_dir)

    margs = dataclasses.make_dataclass(
        "M", [("model_name_or_path", str), ("dtype", str, dataclasses.field(default="float32"))]
    )(out_dir)
    model2, params2 = DRModel.build(margs)
    assert model2.spec.tied == tied and model2.spec.linear_head == linear_head

    rng = np.random.default_rng(5)
    qb, pb = _batch(rng, 2, 8, 97), _batch(rng, 2, 8, 97)
    np.testing.assert_allclose(
        np.asarray(model.encode_query(params, qb)),
        np.asarray(model2.encode_query(params2, qb)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.encode_passage(params, pb)),
        np.asarray(model2.encode_passage(params2, pb)),
        atol=1e-6,
    )


def test_forward_jits(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(6)
    qb, pb = _batch(rng, 2, 8, 97), _batch(rng, 4, 8, 97)

    fwd = jax.jit(lambda p, q, d: model.forward(p, q, d))
    eager = model.forward(params, qb, pb)
    jitted = fwd(params, qb, pb)
    np.testing.assert_allclose(float(eager["loss"]), float(jitted["loss"]), atol=1e-5)
