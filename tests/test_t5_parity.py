"""T5 encoder + step-0 decoder logits parity vs HF torch T5."""

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.models.t5 import (
    T5Config,
    params_from_torch_state_dict,
    t5_decode_step0,
    t5_encode,
)

TINY = dict(
    vocab_size=128,
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_layers=2,
    num_heads=4,
    num_decoder_layers=2,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=20,
    dropout_rate=0.0,
    tie_word_embeddings=True,
    feed_forward_proj="relu",
)


@pytest.fixture(scope="module")
def torch_t5():
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    torch.manual_seed(0)
    model = T5ForConditionalGeneration(HFT5Config(**TINY)).eval()
    return model


def _batch(rng, config, batch=3, seq=9):
    ids = rng.integers(2, config.vocab_size, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[0, 6:] = 0
    ids[mask == 0] = 0
    return ids, mask


def test_encoder_matches_torch(torch_t5):
    import torch

    config = T5Config.from_hf_config(torch_t5.config)
    params = params_from_torch_state_dict(torch_t5.state_dict(), config, with_decoder=True)
    rng = np.random.default_rng(0)
    ids, mask = _batch(rng, config)
    with torch.no_grad():
        ref = torch_t5.encoder(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    ours = np.asarray(t5_encode(params, config, ids, mask))
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4, rtol=1e-3)


def test_decoder_step0_logits_match_torch(torch_t5):
    import torch

    config = T5Config.from_hf_config(torch_t5.config)
    params = params_from_torch_state_dict(torch_t5.state_dict(), config, with_decoder=True)
    rng = np.random.default_rng(1)
    ids, mask = _batch(rng, config)
    with torch.no_grad():
        out = torch_t5(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
            decoder_input_ids=torch.zeros((ids.shape[0], 1), dtype=torch.long),
        )
    ref_logits = out.logits[:, 0, :].numpy()
    enc = t5_encode(params, config, ids, mask)
    ours = np.asarray(t5_decode_step0(params, config, enc, mask))
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4, rtol=1e-3)


def test_encoder_bucket_long_range(torch_t5):
    """Longer sequences exercise the logarithmic relative-position buckets."""
    import torch

    config = T5Config.from_hf_config(torch_t5.config)
    params = params_from_torch_state_dict(torch_t5.state_dict(), config, with_decoder=True)
    rng = np.random.default_rng(2)
    ids = rng.integers(2, config.vocab_size, size=(2, 40)).astype(np.int32)
    mask = np.ones((2, 40), np.int32)
    with torch.no_grad():
        ref = torch_t5.encoder(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()
    ours = np.asarray(t5_encode(params, config, ids, mask))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
