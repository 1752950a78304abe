"""End-to-end slice: train a tiny biencoder, run full retrieval eval, resume.

This is BASELINE.json config 1 ("CPU-runnable NQ dev subset"): synthetic
NQ-style data, tiny BERT towers, full pipeline train → corpus encode → index →
search → answer labeling → metrics → dumps.
"""

import glob
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import DataArguments, RRTrainingArguments, TrainingArguments
from denseretrievaltoolkits_tpu.data.datasets import CorpusDataset, ExactMatchDataset, RRDataset
from denseretrievaltoolkits_tpu.data.loaders import (
    CorpusDataloader,
    ExactMatchDataloader,
    RerankerDataloader,
)
from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.models.reranker import RRModel, RRModelSpec
from denseretrievaltoolkits_tpu.train.trainer import RRTrainer, Trainer

from helpers import make_exactmatch_dataset, make_tokenizer

TINY = None  # set from tokenizer vocab size in fixture


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    tokenizer = make_tokenizer(tmp)
    rng = random.Random(0)
    data_dir, corpus_path, splits, corpus_rows = make_exactmatch_dataset(
        tmp, rng, n_train=16, n_eval=8, n_corpus=32, n_neg=4
    )
    data_args = DataArguments(
        data_dir=data_dir, corpus_path=corpus_path,
        train_n_passages=2, q_max_len=16, p_max_len=24,
        data_cache_dir=str(tmp / "hfcache"),
    )
    train_args = TrainingArguments(
        output_dir=str(tmp / "out"),
        cache_train_dir=str(tmp / "cache"),
        train_batch_size=4, eval_batch_size=4, corpus_batch_size=8,
        max_epochs=2, eval_per_train=2, save_per_train=2,
        learning_rate=1e-3, optimizer="adamw", topk="1,5,10",
        retrieve_num=10, log_every=0,
    )
    bert_config = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=48,
    )
    return tmp, tokenizer, data_args, train_args, bert_config


@pytest.fixture(scope="module")
def trained(setup):
    tmp, tokenizer, data_args, train_args, bert_config = setup
    model = DRModel(DRModelSpec(bert_config=bert_config))
    params = model.init_params(jax.random.key(0))

    dataset = ExactMatchDataset(data_args, tokenizer)
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(
        data_args, dataset, tokenizer, sampler,
        batch_size=[train_args.train_batch_size, train_args.eval_batch_size,
                    train_args.test_batch_size],
    )
    train_dl, eval_dl, test_dl = factory.get_dataloader()
    corpus = CorpusDataset(data_args, tokenizer)
    corpus_dl = CorpusDataloader(
        data_args, corpus, tokenizer, batch_size=train_args.corpus_batch_size
    ).get_dataloader()

    trainer = Trainer(
        train_args, model, params,
        corpus_dataloader=corpus_dl, train_loader=train_dl,
        eval_loader=eval_dl, test_loader=None,
    )
    trainer.train()
    return trainer, train_args


def test_training_reduces_loss(setup):
    tmp, tokenizer, data_args, train_args, bert_config = setup
    model = DRModel(DRModelSpec(bert_config=bert_config))
    params = model.init_params(jax.random.key(1))
    dataset = ExactMatchDataset(data_args, tokenizer)
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, dataset, tokenizer, sampler, batch_size=[4, 4, 4])
    train_dl, _, _ = factory.get_dataloader()
    trainer = Trainer(train_args, model, params, train_loader=train_dl)
    batches = list(train_dl)
    first = trainer.train_step(batches[0])
    losses = [trainer.train_step(b) for _ in range(5) for b in batches]
    assert losses[-1] < first


def test_e2e_eval_artifacts_and_metrics(trained):
    trainer, train_args = trained
    metrics_files = glob.glob(os.path.join(train_args.cache_train_dir, "*_metrics"))
    assert metrics_files, "metrics json not dumped"
    with open(metrics_files[0]) as fh:
        metrics = json.load(fh)
    assert metrics["query_num"] == 8
    assert 0 <= metrics["MRR@10"] <= 1
    assert metrics["Recall@10"] >= metrics["Recall@1"]
    # retrieval dump for the reranker handoff exists and has the row schema
    dumps = glob.glob(os.path.join(train_args.retrieve_dir, "*.json"))
    assert dumps
    row = json.loads(open(dumps[0]).readline())
    assert {"doc_id", "query_id", "query", "document", "answers"} <= set(row)
    # encoded corpus + index + docid order artifacts
    assert glob.glob(os.path.join(train_args.encode_corpus_dir, "*.npy"))
    assert glob.glob(os.path.join(train_args.index_order_dir, "*.docid.txt"))


def test_deploy_save_and_rebuild(trained, setup):
    trainer, train_args = trained
    tmp, tokenizer, data_args, _, bert_config = setup
    result_dirs = glob.glob(os.path.join(train_args.cache_train_dir, "result*"))
    assert result_dirs
    import dataclasses
    margs = dataclasses.make_dataclass(
        "M", [("model_name_or_path", str), ("dtype", str, dataclasses.field(default="float32"))]
    )(result_dirs[0])
    model2, params2 = DRModel.build(margs)
    rng = np.random.default_rng(0)
    batch = {"input_ids": rng.integers(1, 50, (2, 16)).astype(np.int32),
             "attention_mask": np.ones((2, 16), np.int32)}
    a = np.asarray(trainer.model.encode_query(trainer.state["params"], batch))
    b = np.asarray(model2.encode_query(params2, batch))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_checkpoint_resume(trained, setup):
    trainer, train_args = trained
    tmp, tokenizer, data_args, _, bert_config = setup
    ckpts = glob.glob(os.path.join(train_args.output_dir, "checkpoint", "ep*"))
    assert ckpts
    model = DRModel(DRModelSpec(bert_config=bert_config))
    params = model.init_params(jax.random.key(9))
    fresh = Trainer(train_args, model, params)
    fresh.load(ckpts[0])
    assert fresh.start_epoch == int(os.path.basename(ckpts[0])[2:]) + 1
    a = jax.tree.leaves(trainer.state["params"])
    b = jax.tree.leaves(fresh.state["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_index_save_load_roundtrip(trained):
    trainer, train_args = trained
    ep = trainer._indexed_ep
    docids_before = list(trainer.idx)
    trainer._load_index(ep)
    assert trainer.idx == docids_before
    assert trainer.index.docid == docids_before


def test_reranker_e2e(trained, setup):
    """Dense→rerank handoff: RRDataset over the retrieval dump, RRTrainer
    train_step + evaluate."""
    trainer, train_args = trained
    tmp, tokenizer, data_args, _, bert_config = setup

    rr_args = RRTrainingArguments(
        output_dir=str(tmp / "rrout"), cache_train_dir=train_args.cache_train_dir,
        train_batch_size=2, eval_batch_size=4, max_epochs=1,
        learning_rate=1e-3, topk="1,5", retrieve_num=5, log_every=0,
    )
    model = RRModel(RRModelSpec(bert_config=bert_config, loss_fn="mr"))
    params = model.init_params(jax.random.key(3))

    # train on the ExactMatch train split via RRCollator
    dataset = ExactMatchDataset(data_args, tokenizer)
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, dataset, tokenizer, sampler, batch_size=[2, 4, 4])
    rr_train_dl = factory.get_rr_dataloader()

    rr_trainer = RRTrainer(rr_args, model, params, train_loader=rr_train_dl)
    batch = next(iter(rr_train_dl))
    loss = rr_trainer.train_step(batch)
    assert np.isfinite(loss)

    # eval over the dense retriever's dump
    rr_dataset = RRDataset(data_args, rr_args, tokenizer)
    eval_dl = RerankerDataloader(data_args, rr_dataset, tokenizer, batch_size=4).get_eval_dataloader()
    metrics = rr_trainer.evaluate(eval_dl, ep=3)
    assert metrics["query_num"] == 8
    assert glob.glob(os.path.join(rr_args.rr_result_dir, "3.0.json"))
    assert 0 <= metrics["MRR@5"] <= 1


def test_non_finite_loss_halts(setup):
    """A NaN loss epoch raises with resume guidance instead of training on."""
    import dataclasses
    tmp, tokenizer, data_args, train_args, bert_config = setup
    model = DRModel(DRModelSpec(bert_config=bert_config))
    params = model.init_params(jax.random.key(9))
    args = dataclasses.replace(
        train_args,
        output_dir=str(tmp / "nan" / "out"),
        cache_train_dir=str(tmp / "nan" / "cache"),
        learning_rate=1e9,  # diverges within one epoch on fp32->nan
        max_epochs=1, save_per_train=10, eval_per_train=10,
    )
    dataset = ExactMatchDataset(data_args, tokenizer)
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, dataset, tokenizer, sampler,
                                   batch_size=[4, 4, 4])
    train_dl, _, _ = factory.get_dataloader()
    trainer = Trainer(args, model, params, train_loader=train_dl)
    # drive one poisoned step directly: replace params with NaNs mid-flight
    trainer.state["params"] = jax.tree.map(
        lambda x: jnp.full_like(x, jnp.nan) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        trainer.state["params"])
    with pytest.raises(FloatingPointError, match="resume"):
        trainer.train()


def test_evaluate_skips_sentinel_rows(trained):
    """-1 sentinel indices from an IVF-style search must count as misses and
    never translate through self.idx[-1] (the LAST corpus docid) — the
    trainer-side twin of the retrieval-CLI sentinel filter (advisor r3 +
    round-4 self-review)."""
    trainer, train_args = trained
    real_index = trainer.index

    class SentinelIndex:
        docid = real_index.docid

        def __len__(self):
            return len(real_index)

        def search(self, q, k, mode="exact"):
            s, i = real_index.search(q, k, mode="exact")
            s, i = np.array(s), np.array(i)
            s[:, -2:] = -1e30  # fewer finite candidates than k
            i[:, -2:] = -1
            return s, i

    try:
        trainer.index = SentinelIndex()
        trainer._indexed_ep = 99  # keep evaluate() from rebuilding the index
        metrics = trainer.evaluate(trainer.eval_loader, 99)
    finally:
        trainer.index = real_index
    assert metrics["query_num"] == 8
    assert all(np.isfinite(v) for v in metrics.values())
    # the dump must not contain the would-be idx[-1] translation artifacts:
    # every dumped doc_id must come from a NON-sentinel row (scores finite)
    dump = os.path.join(train_args.retrieve_dir, "99.0.json")
    with open(dump) as fh:
        rows = [json.loads(line) for line in fh if line.strip()]
    assert rows and all(r["score"] > -1e29 for r in rows)
