"""Gradient cache numerical parity + on-device dense mining."""

import random

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import DataArguments, TrainingArguments
from denseretrievaltoolkits_tpu.data.datasets import CorpusDataset, ExactMatchDataset
from denseretrievaltoolkits_tpu.data.loaders import CorpusDataloader
from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
from denseretrievaltoolkits_tpu.mine.miner import DenseMiner
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.train.trainer import Trainer

from helpers import make_exactmatch_dataset, make_tokenizer

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


def _args(tmp_path, **kw):
    kw.setdefault("learning_rate", 1e-3)
    kw.setdefault("optimizer", "adamw")
    kw.setdefault("log_every", 0)
    return TrainingArguments(
        output_dir=str(tmp_path / "o"), cache_train_dir=str(tmp_path / "c"), **kw
    )


def test_grad_cache_matches_plain_step(tmp_path):
    """Chunked grad-cache step == plain full-batch step, numerically."""
    rng = np.random.default_rng(0)
    model = DRModel(DRModelSpec(bert_config=TINY))
    params = model.init_params(jax.random.key(0))
    batch = (_batch(rng, 8, 10), _batch(rng, 16, 12))

    plain = Trainer(_args(tmp_path / "a"), model, jax.tree.map(lambda x: x.copy(), params))
    loss_plain = plain.train_step(batch)

    gc = Trainer(
        _args(tmp_path / "b", grad_cache=True, gc_q_chunk_size=2, gc_p_chunk_size=4),
        model, params,
    )
    loss_gc = gc.train_step(batch)

    assert abs(loss_plain - loss_gc) < 1e-5
    for a, b in zip(jax.tree.leaves(plain.state["params"]),
                    jax.tree.leaves(gc.state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_grad_cache_trains(tmp_path):
    rng = np.random.default_rng(1)
    model = DRModel(DRModelSpec(bert_config=TINY))
    params = model.init_params(jax.random.key(1))
    trainer = Trainer(
        _args(tmp_path, grad_cache=True, gc_q_chunk_size=2, gc_p_chunk_size=4),
        model, params,
    )
    batch = (_batch(rng, 4, 10), _batch(rng, 8, 12))
    losses = [trainer.train_step(batch) for _ in range(8)]
    assert losses[-1] < losses[0]


def test_dense_miner_refreshes_negatives(tmp_path):
    tokenizer = make_tokenizer(tmp_path)
    rng = random.Random(0)
    data_dir, corpus_path, _, _ = make_exactmatch_dataset(
        tmp_path, rng, n_train=12, n_eval=4, n_corpus=32, n_neg=3
    )
    data_args = DataArguments(
        data_dir=data_dir, corpus_path=corpus_path, train_n_passages=3,
        q_max_len=16, p_max_len=24,
    )
    ds = ExactMatchDataset(data_args, tokenizer)
    train, _, _ = ds.load_train()

    config = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=48,
    )
    model = DRModel(DRModelSpec(bert_config=config))
    params = model.init_params(jax.random.key(0))
    corpus_dl = CorpusDataloader(
        data_args, CorpusDataset(data_args, tokenizer), tokenizer, batch_size=16
    ).get_dataloader()
    trainer = Trainer(_args(tmp_path), model, params, corpus_dataloader=corpus_dl)
    trainer._encoding_corpus(ep=0)

    miner = DenseMiner(trainer, tokenizer, data_args)
    mined = miner.mine(list(train))
    assert len(mined) == 12
    for sample in mined:
        assert len(sample["negatives"]) == 2  # train_n_passages - 1
        own = {tuple(p) for p in sample["positives"]}
        for neg in sample["negatives"]:
            assert tuple(neg) not in own
    # mined rows feed the standard sampler/collator path
    sampler = RandomSampleNegatives(data_args, seed=0)
    queries, documents = sampler(mined[:4])
    assert len(documents[0]) == 3


def test_grad_cache_on_mesh(tmp_path):
    """grad_cache composes with the mesh: same loss as single-device."""
    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    model = DRModel(DRModelSpec(bert_config=TINY))
    params = model.init_params(jax.random.key(0))
    batch = (_batch(rng, 8, 10), _batch(rng, 16, 12))

    single = Trainer(
        _args(tmp_path / "s", grad_cache=True, gc_q_chunk_size=2, gc_p_chunk_size=4),
        model, jax.tree.map(lambda x: x.copy(), params),
    )
    loss_s = float(single.train_step(batch))

    mesh = make_mesh(4, 2)
    meshed = Trainer(
        _args(tmp_path / "m", grad_cache=True, gc_q_chunk_size=2, gc_p_chunk_size=4),
        model, params, mesh=mesh,
    )
    loss_m = float(meshed.train_step(batch))
    assert abs(loss_s - loss_m) < 1e-4
