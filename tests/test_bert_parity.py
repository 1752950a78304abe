"""Numerics parity of the JAX BERT encoder vs HF torch BertModel.

The reference's towers are HF torch models (``DRT/model/biencoder.py:205``);
our encoder must produce the same last_hidden_state for imported weights.
"""

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.models.bert import (
    BertConfig,
    bert_encode,
    bert_pooler,
    init_params,
    load_params,
    save_params,
)
from denseretrievaltoolkits_tpu.models.hf_import import (
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)

TINY = dict(
    vocab_size=128,
    hidden_size=32,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
)


@pytest.fixture(scope="module")
def torch_model():
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf_config = HFBertConfig(**TINY)
    model = BertModel(hf_config).eval()
    return model


def _batch(rng, config, batch=4, seq=10):
    input_ids = rng.integers(1, config.vocab_size, size=(batch, seq)).astype(np.int32)
    attention_mask = np.ones((batch, seq), np.int32)
    attention_mask[0, 7:] = 0  # ragged mask exercises the bias path
    attention_mask[2, 5:] = 0
    input_ids[attention_mask == 0] = 0
    return input_ids, attention_mask


def test_forward_matches_torch(torch_model):
    import torch

    config = BertConfig.from_hf_config(torch_model.config)
    params = params_from_torch_state_dict(torch_model.state_dict(), config)

    rng = np.random.default_rng(0)
    input_ids, attention_mask = _batch(rng, config)

    with torch.no_grad():
        ref = torch_model(
            input_ids=torch.from_numpy(input_ids).long(),
            attention_mask=torch.from_numpy(attention_mask).long(),
        )
    ours = np.asarray(bert_encode(params, config, input_ids, attention_mask))
    ref_h = ref.last_hidden_state.numpy()

    # Padded positions may differ (torch computes them, we do too, but only
    # attended positions matter downstream). Compare attended positions.
    # Tolerance: fp32 accumulation-order round-off (torch runs oneDNN kernels)
    # is ~1.5e-4 over 3 layers of O(1) post-LN activations.
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(ours[mask], ref_h[mask], atol=1e-3, rtol=1e-3)

    pooled = np.asarray(bert_pooler(params, ours))
    np.testing.assert_allclose(pooled, ref.pooler_output.numpy(), atol=1e-3, rtol=1e-3)


def test_roundtrip_torch_export(torch_model):
    config = BertConfig.from_hf_config(torch_model.config)
    params = params_from_torch_state_dict(torch_model.state_dict(), config)
    sd = params_to_torch_state_dict(params, config)
    orig = torch_model.state_dict()
    for k, v in sd.items():
        np.testing.assert_allclose(v.numpy(), orig[k].numpy(), atol=1e-6)


def test_bf16_forward_close(torch_model):
    import jax.numpy as jnp

    config = BertConfig.from_hf_config(torch_model.config)
    params = params_from_torch_state_dict(torch_model.state_dict(), config)
    rng = np.random.default_rng(1)
    input_ids, attention_mask = _batch(rng, config)
    f32 = np.asarray(bert_encode(params, config, input_ids, attention_mask))
    bf16 = np.asarray(
        bert_encode(params, config, input_ids, attention_mask, compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    mask = attention_mask.astype(bool)
    assert np.abs(f32[mask] - bf16[mask]).mean() < 0.05


def test_params_save_load_roundtrip(tmp_path):
    import jax

    config = BertConfig(**TINY)
    params = init_params(jax.random.key(0), config)
    save_params(params, str(tmp_path))
    loaded = load_params(str(tmp_path))
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_matches(torch_model):
    config = BertConfig.from_hf_config(torch_model.config)
    params = params_from_torch_state_dict(torch_model.state_dict(), config)
    rng = np.random.default_rng(2)
    input_ids, attention_mask = _batch(rng, config)
    a = np.asarray(bert_encode(params, config, input_ids, attention_mask, remat=False))
    b = np.asarray(bert_encode(params, config, input_ids, attention_mask, remat=True))
    c = np.asarray(bert_encode(params, config, input_ids, attention_mask, remat="attn"))
    np.testing.assert_allclose(a, c, atol=1e-6)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_attn_remat_grads_match():
    """remat='attn' (recompute only tagged attention tensors in backward)
    must produce identical gradients to no-remat."""
    import jax
    import jax.numpy as jnp
    from denseretrievaltoolkits_tpu.models import bert

    config = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16)
    params = bert.init_params(jax.random.key(0), config)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)

    def loss(p, remat):
        h = bert.bert_encode(p, config, ids, mask, remat=remat)
        return jnp.sum(h * h)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, "attn"))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_flash_attention_flag_falls_back_off_tpu():
    """attention='flash' must be a no-op off-TPU: same outputs as 'xla'.

    On the real chip the flash path replaces the einsum+softmax inner with
    the Pallas kernel (numerics asserted on hardware in
    recipes/profile_encoder.py); off-TPU bert_encode silently falls back so
    one spec serves both environments."""
    import jax
    import numpy as np

    from denseretrievaltoolkits_tpu.models import bert
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

    config = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16)
    rng = np.random.default_rng(0)
    batch = {"input_ids": rng.integers(1, 64, (3, 10)).astype(np.int32),
             "attention_mask": np.ones((3, 10), np.int32)}
    m_x = DRModel(DRModelSpec(bert_config=config, attention="xla"))
    params = m_x.init_params(jax.random.key(0))
    m_f = DRModel(DRModelSpec(bert_config=config, attention="flash"))
    np.testing.assert_array_equal(
        np.asarray(m_x.encode_passage(params, batch)),
        np.asarray(m_f.encode_passage(params, batch)))


def test_unknown_attention_impl_raises():
    import pytest

    from denseretrievaltoolkits_tpu.models import bert
    from denseretrievaltoolkits_tpu.models.biencoder import DRModelSpec

    with pytest.raises(ValueError, match="attention"):
        DRModelSpec(bert_config=bert.BertConfig(), attention="fancy")


def test_fused_attention_parity_and_grads():
    """attention='fused' (ops/attn.py single-block kernel, interpret mode on
    CPU) matches the xla path on values AND gradients, including pad tokens
    and a sequence length off the sublane granule (S=13 -> Sp=16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from denseretrievaltoolkits_tpu.models import bert
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

    config = bert.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 64, (4, 13)).astype(np.int32)
    mask = np.ones((4, 13), np.int32)
    mask[0, 9:] = 0  # ragged padding
    mask[2, 5:] = 0
    batch = {"input_ids": ids, "attention_mask": mask}

    m_x = DRModel(DRModelSpec(bert_config=config, attention="xla"))
    params = m_x.init_params(jax.random.key(0))
    m_f = DRModel(DRModelSpec(bert_config=config, attention="fused"))

    out_x = np.asarray(m_x.encode_passage(params, batch))
    out_f = np.asarray(m_f.encode_passage(params, batch))
    np.testing.assert_allclose(out_f, out_x, rtol=2e-5, atol=2e-5)

    def loss(m):
        def fn(p):
            reps = m.encode_passage(p, batch)
            return jnp.sum(reps * reps)
        return fn

    g_x = jax.grad(loss(m_x))(params)
    g_f = jax.grad(loss(m_f))(params)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)
