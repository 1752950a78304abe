"""Relevancy (docid-labeled) eval path + mesh-sharded trainer eval pipeline."""

import json
import random

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import DataArguments, TrainingArguments
from denseretrievaltoolkits_tpu.data.datasets import (
    CorpusDataset,
    ExactMatchDataset,
    RelevancyDataset,
)
from denseretrievaltoolkits_tpu.data.loaders import CorpusDataloader, ExactMatchDataloader
from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
from denseretrievaltoolkits_tpu.train.trainer import Trainer

from helpers import make_exactmatch_dataset, make_tokenizer


def _setup(tmp_path, tokenizer, **targs):
    rng = random.Random(0)
    data_dir, corpus_path, splits, corpus_rows = make_exactmatch_dataset(
        tmp_path, rng, n_train=8, n_eval=4, n_corpus=24, n_neg=3
    )
    data_args = DataArguments(
        data_dir=data_dir, corpus_path=corpus_path, train_n_passages=2,
        q_max_len=16, p_max_len=24,
    )
    targs.setdefault("learning_rate", 1e-3)
    targs.setdefault("log_every", 0)
    targs.setdefault("topk", "1,5")
    targs.setdefault("retrieve_num", 5)
    train_args = TrainingArguments(
        output_dir=str(tmp_path / "o"), cache_train_dir=str(tmp_path / "c"), **targs
    )
    config = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=48,
    )
    return data_args, train_args, config, splits


def test_relevancy_docid_labeling(tmp_path):
    """RelevancyDataset eval rows carry positive docids; the trainer labels
    hits by docid membership (MS MARCO registry semantics)."""
    tokenizer = make_tokenizer(tmp_path)
    data_args, train_args, config, splits = _setup(tmp_path, tokenizer)
    ds = RelevancyDataset(data_args, tokenizer)
    _, dev, _ = ds.load_train()
    assert "positives_ids" in dev[0]

    model = DRModel(DRModelSpec(bert_config=config))
    params = model.init_params(jax.random.key(0))
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, ds, tokenizer, sampler, batch_size=[4, 4, 4])
    _, eval_dl, _ = factory.get_dataloader()
    corpus_dl = CorpusDataloader(
        data_args, CorpusDataset(data_args, tokenizer), tokenizer, batch_size=12
    ).get_dataloader()

    trainer = Trainer(
        train_args, model, params, corpus_dataloader=corpus_dl,
        label_kind="docids",
    )
    metrics = trainer.evaluate(eval_dl, ep=1)
    assert metrics["query_num"] == 4
    # docid labels: every dev query has exactly one positive docid in the
    # corpus, so Recall@5 is well-defined and bounded by 1
    assert 0.0 <= metrics["Recall@5"] <= 1.0


def test_mesh_sharded_eval_pipeline(tmp_path):
    """Full evaluate() with a mesh: the corpus index shards over all devices
    and search merges per-shard candidates over the (virtual) interconnect."""
    tokenizer = make_tokenizer(tmp_path)
    data_args, train_args, config, splits = _setup(tmp_path, tokenizer)
    ds = ExactMatchDataset(data_args, tokenizer)
    model = DRModel(DRModelSpec(bert_config=config))
    params = model.init_params(jax.random.key(0))
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, ds, tokenizer, sampler, batch_size=[4, 4, 4])
    _, eval_dl, _ = factory.get_dataloader()
    corpus_dl = CorpusDataloader(
        data_args, CorpusDataset(data_args, tokenizer), tokenizer, batch_size=12
    ).get_dataloader()

    mesh = make_mesh(4, 2)
    trainer = Trainer(
        train_args, model, params, corpus_dataloader=corpus_dl, mesh=mesh,
    )
    metrics = trainer.evaluate(eval_dl, ep=1)
    from denseretrievaltoolkits_tpu.parallel.sharded_index import ShardedFlatIndex

    assert isinstance(trainer.index, ShardedFlatIndex)
    assert metrics["query_num"] == 4

    # single-device trainer must produce identical metrics
    t2 = Trainer(
        TrainingArguments(output_dir=str(tmp_path / "o2"),
                          cache_train_dir=str(tmp_path / "c2"),
                          learning_rate=1e-3, log_every=0, topk="1,5",
                          retrieve_num=5),
        model, params, corpus_dataloader=corpus_dl,
    )
    m2 = t2.evaluate(eval_dl, ep=1)
    # tp-sharded encode differs from single-device by fp round-off (~1e-5),
    # which can swap exact-tie ranks on this tiny synthetic corpus (duplicated
    # doc texts) — metrics must agree up to one boundary swap
    for key in metrics:
        np.testing.assert_allclose(metrics[key], m2[key], atol=0.05)

    # sharded index save/load roundtrip
    trainer._load_index(1)
    assert isinstance(trainer.index, ShardedFlatIndex)
    assert len(trainer.index) == 24


def test_approx_topk_blockwise_recall():
    from denseretrievaltoolkits_tpu.ops.topk import approx_topk

    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(3000, 32)).astype(np.float32)
    q = rng.normal(size=(6, 32)).astype(np.float32)
    scores, indices = approx_topk(q, corpus, k=10, recall_target=0.95, block_size=1024)
    full = q @ corpus.T
    ref = np.argsort(-full, axis=1)[:, :10]
    recall = np.mean([len(set(np.asarray(indices)[r]) & set(ref[r])) / 10 for r in range(6)])
    assert recall >= 0.8  # CPU lowering of approx_max_k is exact-ish; TPU ~target
    assert np.asarray(indices).max() < 3000


def test_sharded_serve_mode():
    """mode='serve' on the 8-device mesh: CPU has no Pallas fast path, so the
    scan serves and results stay exact; the mode string must round-trip the
    shard_map rebuild without error."""
    import numpy as np
    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
    from denseretrievaltoolkits_tpu.parallel.sharded_index import ShardedFlatIndex

    rng = np.random.default_rng(21)
    corpus = rng.normal(size=(640, 24)).astype(np.float32)
    q = rng.normal(size=(4, 24)).astype(np.float32)
    idx = ShardedFlatIndex(make_mesh(8, 1), 24, block_size=32)
    idx.add(corpus)
    s, i = idx.search(q, 12, mode="serve")
    ref = np.argsort(-(q @ corpus.T), axis=1)[:, :12]
    np.testing.assert_array_equal(i, ref)


def test_sharded_approx_mode_int8():
    """mode='approx' on int8 shards routes to the native-int8 packed kernel
    on TPU; off-TPU the exact scan serves, so the mode string must build and
    return sane results either way (parity with FlatIPIndex mode='approx')."""
    import numpy as np
    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
    from denseretrievaltoolkits_tpu.parallel.sharded_index import ShardedFlatIndex

    rng = np.random.default_rng(22)
    corpus = rng.normal(size=(640, 24)).astype(np.float32)
    q = rng.normal(size=(4, 24)).astype(np.float32)
    idx = ShardedFlatIndex(make_mesh(8, 1), 24, dtype="int8", block_size=32)
    idx.add(corpus)
    s, i = idx.search(q, 12, mode="approx")
    ref = np.argsort(-(q @ corpus.T), axis=1)[:, :12]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref)])
    assert overlap >= 11.0, overlap
    assert np.all(np.diff(s, axis=1) <= 1e-5)
