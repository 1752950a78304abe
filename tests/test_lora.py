"""LoRA parameter-efficient fine-tuning: init identity, frozen base, merge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import TrainingArguments
from denseretrievaltoolkits_tpu.models.bert import BertConfig, bert_encode
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.models.lora import add_lora, lora_mask, merge_lora
from denseretrievaltoolkits_tpu.train.trainer import Trainer

# long-running integration file: excluded from the smoke set (pytest -m 'not slow')
pytestmark = pytest.mark.slow

TINY = BertConfig(
    vocab_size=97, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=48,
)


def _batch(rng, n, seq):
    return {
        "input_ids": rng.integers(1, 97, size=(n, seq)).astype(np.int32),
        "attention_mask": np.ones((n, seq), np.int32),
    }


def test_lora_init_is_identity():
    """B=0 at init: the adapted tower equals the base tower exactly."""
    import denseretrievaltoolkits_tpu.models.bert as bert

    base = bert.init_params(jax.random.key(0), TINY)
    adapted = add_lora(base, jax.random.key(1), rank=4)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 97, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    a = np.asarray(bert_encode(base, TINY, ids, mask))
    b = np.asarray(bert_encode(adapted, TINY, ids, mask))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_lora_training_freezes_base(tmp_path):
    margs = dataclasses.make_dataclass(
        "M",
        [("model_name_or_path", type(None), dataclasses.field(default=None)),
         ("dtype", str, dataclasses.field(default="float32")),
         ("untie_encoder", bool, dataclasses.field(default=False)),
         ("encoder_only", bool, dataclasses.field(default=False)),
         ("feature", str, dataclasses.field(default="last_hidden_state")),
         ("pooling", str, dataclasses.field(default="first")),
         ("add_linear_head", bool, dataclasses.field(default=False)),
         ("normalize", bool, dataclasses.field(default=False)),
         ("param_efficient_method", str, dataclasses.field(default="lora")),
         ("lora_rank", int, dataclasses.field(default=4))],
    )()
    model, params = DRModel.build(margs, rng=jax.random.key(0), bert_config=TINY)
    assert "lora_q_A" in params["lm_q"]["layers"]

    targs = TrainingArguments(output_dir=str(tmp_path / "o"),
                              cache_train_dir=str(tmp_path / "c"),
                              learning_rate=1e-2, optimizer="adamw", log_every=0)
    trainer = Trainer(targs, model, params)
    base_before = np.asarray(trainer.state["params"]["lm_q"]["layers"]["q_kernel"])
    lora_before = np.asarray(trainer.state["params"]["lm_q"]["layers"]["lora_q_B"])
    rng = np.random.default_rng(0)
    batch = (_batch(rng, 4, 8), _batch(rng, 8, 10))
    for _ in range(3):
        loss = trainer.train_step(batch)
    base_after = np.asarray(trainer.state["params"]["lm_q"]["layers"]["q_kernel"])
    lora_after = np.asarray(trainer.state["params"]["lm_q"]["layers"]["lora_q_B"])
    np.testing.assert_array_equal(base_before, base_after)  # frozen
    assert np.abs(lora_after - lora_before).max() > 0  # adapters trained
    assert np.isfinite(float(loss))


def test_lora_mask_marks_heads_trainable():
    import denseretrievaltoolkits_tpu.models.bert as bert
    import denseretrievaltoolkits_tpu.models.linear as linear

    params = {
        "lm_q": add_lora(bert.init_params(jax.random.key(0), TINY), jax.random.key(1), 4),
        "head_q": linear.init_head(jax.random.key(2), 16, 8),
    }
    mask = lora_mask(params)
    assert mask["head_q"]["kernel"] is True
    assert mask["lm_q"]["layers"]["lora_q_A"] is True
    assert mask["lm_q"]["layers"]["q_kernel"] is False


def test_lora_merge_matches_adapted_forward():
    import denseretrievaltoolkits_tpu.models.bert as bert

    base = bert.init_params(jax.random.key(0), TINY)
    adapted = add_lora(base, jax.random.key(1), rank=4)
    # give the adapters nonzero weights
    adapted["layers"]["lora_q_B"] = (
        jax.random.normal(jax.random.key(2), adapted["layers"]["lora_q_B"].shape) * 0.05
    )
    adapted["layers"]["lora_v_B"] = (
        jax.random.normal(jax.random.key(3), adapted["layers"]["lora_v_B"].shape) * 0.05
    )
    merged = merge_lora(adapted)
    assert "lora_q_A" not in merged["layers"]
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 97, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    a = np.asarray(bert_encode(adapted, TINY, ids, mask))
    b = np.asarray(bert_encode(merged, TINY, ids, mask))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_t5_lora_init_identity_and_train():
    from denseretrievaltoolkits_tpu.models import t5 as t5m
    from denseretrievaltoolkits_tpu.models.lora import add_lora, has_lora
    from denseretrievaltoolkits_tpu.train.optimizers import get_optimizer

    config = t5m.T5Config(vocab_size=97, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                          num_heads=4, relative_attention_num_buckets=8,
                          relative_attention_max_distance=20)
    base = t5m.init_params(jax.random.key(0), config)
    adapted = add_lora(base, jax.random.key(1), rank=4)
    assert has_lora({"lm_q": adapted})
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 97, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    a = np.asarray(t5m.t5_encode(base, config, ids, mask))
    b = np.asarray(t5m.t5_encode(adapted, config, ids, mask))
    np.testing.assert_allclose(a, b, atol=1e-6)
