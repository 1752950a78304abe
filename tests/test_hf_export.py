"""HF deploy-format export path + dict-typed CLI args."""

import dataclasses
import json

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import parse_args
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

# long-running integration file: excluded from the smoke set (pytest -m 'not slow')
pytestmark = pytest.mark.slow

TINY = dict(
    vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)


def test_export_hf_roundtrip(tmp_path):
    """DRModel.export_hf writes a loadable HF torch checkpoint with identical
    forward numerics."""
    import torch
    from transformers import BertModel

    config = BertConfig(**TINY)
    model = DRModel(DRModelSpec(bert_config=config))
    params = model.init_params(jax.random.key(0))
    out = str(tmp_path / "hf")
    model.export_hf(params, out)

    hf = BertModel.from_pretrained(out).eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask).long()).last_hidden_state.numpy()
    from denseretrievaltoolkits_tpu.models.bert import bert_encode

    ours = np.asarray(bert_encode(params["lm_q"], config, ids, mask))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_export_hf_untied(tmp_path):
    from transformers import BertModel

    config = BertConfig(**TINY)
    model = DRModel(DRModelSpec(bert_config=config, tied=False))
    params = model.init_params(jax.random.key(1))
    out = str(tmp_path / "hf2")
    model.export_hf(params, out)
    BertModel.from_pretrained(out + "/query_model")
    BertModel.from_pretrained(out + "/passage_model")


def test_parse_dict_typed_cli(tmp_path):
    m, d, t = parse_args(
        args=[
            "--model_name_or_path", "x",
            "--cache_train_dir", str(tmp_path),
            "--optimizer", "adamw",
            "--optimizer_kwargs", '{"weight_decay": 0.01, "b1": 0.85}',
            "--scheduler", "linear",
            "--scheduler_kwargs", '{"n_warmup_steps": 10, "max_steps": 100}',
        ]
    )
    assert t.optimizer_kwargs == {"weight_decay": 0.01, "b1": 0.85}
    # the schedule builds and the optimizer factory accepts the kwargs
    from denseretrievaltoolkits_tpu.train.optimizers import get_optimizer

    opt = get_optimizer(t)
    import jax.numpy as jnp

    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
