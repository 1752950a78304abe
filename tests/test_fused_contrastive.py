"""Fused Pallas contrastive loss: value + gradient parity with the XLA form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.ops.contrastive import (
    contrastive_loss_auto,
    fused_contrastive_loss,
)
from denseretrievaltoolkits_tpu.train.losses import contrastive_loss

# long-running integration file: excluded from the smoke set (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _data(rng, Q, P, H):
    q = rng.normal(size=(Q, H)).astype(np.float32)
    p = rng.normal(size=(P, H)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(p)


@pytest.mark.parametrize("Q,P,H", [(8, 16, 64), (16, 16, 128), (8, 64, 64)])
def test_fused_loss_value_matches_xla(Q, P, H):
    rng = np.random.default_rng(0)
    q, p = _data(rng, Q, P, H)
    stride = P // Q
    fused = float(fused_contrastive_loss(q, p, stride))
    ref = float(contrastive_loss(q, p)[0])
    np.testing.assert_allclose(fused, ref, rtol=1e-5)


def test_fused_loss_grads_match_xla():
    rng = np.random.default_rng(1)
    q, p = _data(rng, 8, 16, 64)

    def fused_fn(q, p):
        return fused_contrastive_loss(q, p, 2)

    def ref_fn(q, p):
        return contrastive_loss(q, p)[0]

    gq_f, gp_f = jax.grad(fused_fn, argnums=(0, 1))(q, p)
    gq_r, gp_r = jax.grad(ref_fn, argnums=(0, 1))(q, p)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), atol=1e-5)


def test_fused_loss_nontile_query_count():
    """Q not a multiple of the tile: padded rows must contribute nothing."""
    rng = np.random.default_rng(2)
    q, p = _data(rng, 6, 12, 32)  # qt will pad 6 -> 8
    fused = float(fused_contrastive_loss(q, p, 2))
    ref = float(contrastive_loss(q, p)[0])
    np.testing.assert_allclose(fused, ref, rtol=1e-5)
    gq_f = jax.grad(lambda a, b: fused_contrastive_loss(a, b, 2), argnums=0)(q, p)
    gq_r = jax.grad(lambda a, b: contrastive_loss(a, b)[0], argnums=0)(q, p)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_r), atol=1e-5)


def test_auto_dispatch_fallback():
    rng = np.random.default_rng(3)
    # non-stride shape (P % Q != 0) -> XLA path with scores
    q, p = _data(rng, 5, 12, 64)
    loss, scores = contrastive_loss_auto(q, p)
    assert scores is not None
    # stride shape -> fused path, no scores materialized
    q, p = _data(rng, 8, 16, 64)
    loss, scores = contrastive_loss_auto(q, p)
    assert scores is None and np.isfinite(float(loss))


def test_fused_loss_nontile_passage_count():
    """P not a multiple of the passage tile: padded cols leave the softmax."""
    rng = np.random.default_rng(5)
    q, p = _data(rng, 8, 600, 32)  # PT pads 600 -> 608; stride 75
    fused = float(fused_contrastive_loss(q, p, 75))
    ref = float(contrastive_loss(q, p)[0])
    np.testing.assert_allclose(fused, ref, rtol=1e-5)
    gp_f = jax.grad(lambda a, b: fused_contrastive_loss(a, b, 75), argnums=1)(q, p)
    gp_r = jax.grad(lambda a, b: contrastive_loss(a, b)[0], argnums=1)(q, p)
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r), atol=1e-5)



def test_drmodel_fused_loss_flag():
    from denseretrievaltoolkits_tpu.models.bert import BertConfig
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

    config = BertConfig(vocab_size=97, hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=48)
    rng = np.random.default_rng(4)
    batch_q = {"input_ids": rng.integers(1, 97, (4, 8)).astype(np.int32),
               "attention_mask": np.ones((4, 8), np.int32)}
    batch_p = {"input_ids": rng.integers(1, 97, (8, 10)).astype(np.int32),
               "attention_mask": np.ones((8, 10), np.int32)}
    plain = DRModel(DRModelSpec(bert_config=config))
    fused = DRModel(DRModelSpec(bert_config=config, fused_loss=True))
    params = plain.init_params(jax.random.key(0))
    l_plain = float(plain.forward(params, batch_q, batch_p)["loss"])
    out_f = fused.forward(params, batch_q, batch_p)
    assert "scores" not in out_f
    np.testing.assert_allclose(float(out_f["loss"]), l_plain, rtol=1e-5)


def test_fused_loss_under_mesh_and_gradcache(tmp_path):
    """GSPMD composes with the fused-loss pallas_call (plain and grad-cache)."""
    import tempfile

    from denseretrievaltoolkits_tpu.config import TrainingArguments
    from denseretrievaltoolkits_tpu.models.bert import BertConfig
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
    from denseretrievaltoolkits_tpu.train.trainer import Trainer

    tiny = BertConfig(vocab_size=97, hidden_size=16, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=48)
    model = DRModel(DRModelSpec(bert_config=tiny, fused_loss=True))
    params = model.init_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    batch = (
        {"input_ids": rng.integers(1, 97, (8, 10)).astype(np.int32),
         "attention_mask": np.ones((8, 10), np.int32)},
        {"input_ids": rng.integers(1, 97, (16, 12)).astype(np.int32),
         "attention_mask": np.ones((16, 12), np.int32)},
    )
    losses = []
    for gc in (False, True):
        t = Trainer(
            TrainingArguments(output_dir=str(tmp_path / f"o{gc}"),
                              cache_train_dir=str(tmp_path / f"c{gc}"),
                              learning_rate=1e-3, log_every=0, grad_cache=gc,
                              gc_q_chunk_size=2, gc_p_chunk_size=4),
            model, jax.tree.map(lambda x: x.copy(), params), mesh=make_mesh(4, 2),
        )
        losses.append(float(t.train_step(batch)))
    np.testing.assert_allclose(losses[0], losses[1], atol=1e-5)
