"""Bucketed variable-length corpus encode (data/collators.bucket_length,
loaders sort_by_length, trainer row->dataset-row translation).

The reference pads every batch to its own max via ``tokenizer.pad``
(dynamic shapes are free in torch); the TPU answer is length-sorted
iteration + per-batch bucket padding, compiling at most
ceil(p_max/bucket_step) encode variants. These tests pin:

- bucket arithmetic and collator behavior,
- that bucketing actually produces multiple (smaller) shapes,
- the invariant everything hinges on: index row r holds dataset row
  _row2ds[r] (docids stay order-true, text lookups translate),
- end-to-end metric equality with the non-bucketed pipeline,
- perm persistence through _index_corpus -> _load_index.
"""

import glob
import json
import os
import random

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import DataArguments, TrainingArguments
from denseretrievaltoolkits_tpu.data.collators import bucket_length, pad_batch
from denseretrievaltoolkits_tpu.data.datasets import CorpusDataset, ExactMatchDataset
from denseretrievaltoolkits_tpu.data.loaders import CorpusDataloader, DataLoader, ExactMatchDataloader
from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.train.trainer import Trainer

from helpers import WORDS, make_exactmatch_dataset, make_tokenizer


def test_bucket_length():
    assert bucket_length(1, 156) == 32
    assert bucket_length(32, 156) == 32
    assert bucket_length(33, 156) == 64
    assert bucket_length(150, 156) == 156  # capped at max
    assert bucket_length(7, 24, step=8) == 8
    assert bucket_length(17, 24, step=8) == 24


def test_pad_batch_bucket_step():
    seqs = [[1, 2, 3], [4, 5]]
    fixed = pad_batch(seqs, 24, 0)
    assert fixed["input_ids"].shape == (2, 24)
    bucketed = pad_batch(seqs, 24, 0, bucket_step=8)
    assert bucketed["input_ids"].shape == (2, 8)
    # real tokens and masks agree where both exist
    np.testing.assert_array_equal(fixed["input_ids"][:, :8], bucketed["input_ids"])
    np.testing.assert_array_equal(fixed["attention_mask"][:, :8],
                                  bucketed["attention_mask"])
    # a batch at the cap pads to max_len
    long = pad_batch([[1] * 23], 24, 0, bucket_step=8)
    assert long["input_ids"].shape == (1, 24)


def test_dataloader_sort_by_length():
    data = [{"v": list(range(n))} for n in (5, 1, 3, 2, 4)]
    dl = DataLoader(data, 2, lambda feats: [len(f["v"]) for f in feats],
                    sort_by_length=lambda ex: len(ex["v"]))
    batches = list(dl)
    assert batches == [[1, 2], [3, 4], [5]]
    with pytest.raises(AssertionError):
        DataLoader(data, 2, list, shuffle=True,
                   sort_by_length=lambda ex: len(ex["v"]))


@pytest.fixture(scope="module")
def varlen_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bucketed")
    tokenizer = make_tokenizer(tmp)
    rng = random.Random(0)
    data_dir, corpus_path, splits, corpus_rows = make_exactmatch_dataset(
        tmp, rng, n_train=8, n_eval=8, n_corpus=48, n_neg=2
    )
    # spread corpus text lengths across buckets (helpers' corpus is
    # near-constant length): docid/text pairing and planted answers survive
    # because we only append filler words
    rows = [json.loads(l) for l in open(corpus_path, encoding="utf-8")]
    for i, row in enumerate(rows):
        row["text"] = row["text"] + " " + " ".join(
            WORDS[(i + j) % len(WORDS)] for j in range(i % 16)
        )
    with open(corpus_path, "w", encoding="utf-8") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")

    def make_trainer(bucketed: bool, subdir: str):
        data_args = DataArguments(
            data_dir=data_dir, corpus_path=corpus_path,
            train_n_passages=2, q_max_len=16, p_max_len=40,
            bucketed_encode=bucketed, bucket_step=8,
            data_cache_dir=str(tmp / "hfcache"),
        )
        train_args = TrainingArguments(
            output_dir=str(tmp / subdir / "out"),
            cache_train_dir=str(tmp / subdir / "cache"),
            train_batch_size=4, eval_batch_size=4, corpus_batch_size=8,
            max_epochs=1, learning_rate=1e-3, optimizer="adamw",
            topk="1,5,10", retrieve_num=10, log_every=0,
        )
        bert_config = BertConfig(
            vocab_size=tokenizer.vocab_size, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=48,
        )
        model = DRModel(DRModelSpec(bert_config=bert_config))
        params = model.init_params(jax.random.key(0))
        dataset = ExactMatchDataset(data_args, tokenizer)
        sampler = RandomSampleNegatives(data_args, seed=0)
        factory = ExactMatchDataloader(data_args, dataset, tokenizer, sampler,
                                       batch_size=[4, 4, 4])
        _, eval_dl, _ = factory.get_dataloader()
        corpus = CorpusDataset(data_args, tokenizer)
        corpus_dl = CorpusDataloader(data_args, corpus, tokenizer,
                                     batch_size=8).get_dataloader()
        trainer = Trainer(train_args, model, params,
                          corpus_dataloader=corpus_dl, eval_loader=eval_dl)
        return trainer, eval_dl, train_args

    return make_trainer


def test_bucketed_loader_yields_multiple_shapes(varlen_setup):
    trainer, _, _ = varlen_setup(True, "shapes")
    widths = {batch["input_ids"].shape[1]
              for _, batch in trainer.corpus_dataloader}
    assert len(widths) > 1, "bucketing produced a single shape"
    assert all(w % 8 == 0 or w == 40 for w in widths)
    assert min(widths) < 40, "no batch landed under p_max"
    # length-sorted: batch widths are non-decreasing over iteration
    seq = [batch["input_ids"].shape[1] for _, batch in trainer.corpus_dataloader]
    assert seq == sorted(seq)


def test_row_to_dataset_row_invariant(varlen_setup):
    trainer, _, _ = varlen_setup(True, "inv")
    trainer._encoding_corpus(0)
    perm = trainer._row2ds
    assert perm is not None and len(perm) == len(trainer.idx)
    ds = trainer.corpus_dataloader.dataset
    for r in range(0, len(perm), 7):
        assert ds[int(perm[r])]["id"] == trainer.idx[r]


def test_bucketed_eval_matches_fixed_pad(varlen_setup):
    t_fixed, ev_fixed, _ = varlen_setup(False, "fixed")
    t_bucket, ev_bucket, _ = varlen_setup(True, "bucket")
    m_fixed = t_fixed.evaluate(ev_fixed, 0)
    m_bucket = t_bucket.evaluate(ev_bucket, 0)
    assert t_fixed._row2ds is None and t_bucket._row2ds is not None
    for k, v in m_fixed.items():
        assert abs(v - m_bucket[k]) < 1e-6, (k, v, m_bucket[k])
    # identical reps per docid (padding length must not change real tokens'
    # encodings: masked columns contribute exact zeros)
    import numpy as np
    reps_f = {t_fixed.idx[i]: row for i, row in enumerate(
        np.load(glob.glob(os.path.join(
            t_fixed.training_args.encode_corpus_dir, "*.npy"))[0]))}
    reps_b = {t_bucket.idx[i]: row for i, row in enumerate(
        np.load(glob.glob(os.path.join(
            t_bucket.training_args.encode_corpus_dir, "*.npy"))[0]))}
    assert set(reps_f) == set(reps_b)
    for did in reps_f:
        np.testing.assert_allclose(reps_f[did], reps_b[did],
                                   rtol=1e-5, atol=1e-5)


def test_perm_persists_through_index_save_load(varlen_setup):
    trainer, ev, targs = varlen_setup(True, "persist")
    trainer.evaluate(ev, 0)
    perm = np.asarray(trainer._row2ds).copy()
    trainer._row2ds = None
    trainer._load_index(0)
    assert trainer._row2ds is not None
    np.testing.assert_array_equal(np.asarray(trainer._row2ds), perm)


def test_bucketed_encode_rejected_multihost():
    args = DataArguments(bucketed_encode=True, p_max_len=24)
    with pytest.raises(ValueError, match="single-host"):
        CorpusDataloader(args, None, None, shard_hosts=True)


def test_run_encode_bucketed_matches_fixed(tmp_path):
    """run_encode --bucketed_encode: same per-docid reps as the fixed-pad
    run (the pickle is (reps, lookup) order-aligned, so sorting is free)."""
    import json as _json
    import pickle
    import random as _random

    import run_encode

    tokenizer = make_tokenizer(tmp_path)
    tokdir = tmp_path / "tok"
    tokenizer.save_pretrained(str(tokdir))
    from denseretrievaltoolkits_tpu.models.bert import BertConfig, save_config
    cfg = BertConfig(vocab_size=tokenizer.vocab_size, hidden_size=16,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=32, max_position_embeddings=48)
    arch = tmp_path / "arch"
    save_config(cfg, str(arch))

    rng = _random.Random(0)
    corpus_path = tmp_path / "corpus.jsonl"
    with open(corpus_path, "w") as fh:
        for i in range(40):
            text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(2 + i % 20))
            fh.write(_json.dumps({"docid": f"d{i}", "title": "t", "text": text}) + "\n")

    common = [
        "--model_name_or_path", str(arch), "--tokenizer_name", str(tokdir),
        "--cache_train_dir", str(tmp_path / "cache"),
        "--output_dir", str(tmp_path / "out"),
        "--data_cache_dir", str(tmp_path / "hf"),
        "--q_max_len", "16", "--p_max_len", "32", "--corpus_batch_size", "8",
        "--encode_in_path", str(corpus_path),
    ]
    run_encode.main(common + ["--encodedp_save_path", str(tmp_path / "f.pkl")])
    run_encode.main(common + ["--encodedp_save_path", str(tmp_path / "b.pkl"),
                              "--bucketed_encode", "--bucket_step", "8"])
    reps_f, look_f = pickle.load(open(tmp_path / "f.pkl", "rb"))
    reps_b, look_b = pickle.load(open(tmp_path / "b.pkl", "rb"))
    assert sorted(look_f) == sorted(look_b)
    assert look_f != look_b, "bucketed run should iterate length-sorted"
    by_id_f = {d: reps_f[i] for i, d in enumerate(look_f)}
    by_id_b = {d: reps_b[i] for i, d in enumerate(look_b)}
    for d in by_id_f:
        np.testing.assert_allclose(by_id_f[d], by_id_b[d], rtol=1e-5, atol=1e-5)


def test_reranker_eval_bucketed_matches_fixed(tmp_path):
    """RRTrainer.evaluate with a bucketed pair loader: identical metrics to
    the fixed-pad loader (scores group by qid, so iteration order is free)."""
    from denseretrievaltoolkits_tpu.config import RRTrainingArguments
    from denseretrievaltoolkits_tpu.data.loaders import RerankerDataloader
    from denseretrievaltoolkits_tpu.models.reranker import RRModel, RRModelSpec
    from denseretrievaltoolkits_tpu.train.trainer import RRTrainer

    tokenizer = make_tokenizer(tmp_path)
    rng = random.Random(0)
    rows = []
    for qi in range(4):
        answer = WORDS[qi]
        q = tokenizer(" ".join(WORDS[qi:qi + 3]), add_special_tokens=False)["input_ids"]
        for di in range(6):
            text = " ".join(WORDS[(qi + di + j) % len(WORDS)]
                            for j in range(3 + (qi * 6 + di) % 12))
            if di == 0:
                text = text + " " + answer
            d = tokenizer(text, add_special_tokens=False)["input_ids"]
            rows.append({"query_id": f"q{qi}", "doc_id": f"d{qi}_{di}",
                         "query": q, "document": d, "answers": [answer],
                         "original": text})

    class FakeDS:
        def load_dataset(self):
            return rows

    bert_config = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=48)
    model = RRModel(RRModelSpec(bert_config=bert_config, loss_fn="mr"))
    params = model.init_params(jax.random.key(0))

    def run(bucketed, sub):
        data_args = DataArguments(train_n_passages=2, q_max_len=8, p_max_len=24,
                                  bucketed_encode=bucketed, bucket_step=8)
        args = RRTrainingArguments(
            output_dir=str(tmp_path / sub / "out"),
            cache_train_dir=str(tmp_path / sub / "cache"),
            learning_rate=1e-3, optimizer="adamw", topk="1,5", log_every=0)
        loader = RerankerDataloader(data_args, FakeDS(), tokenizer,
                                    batch_size=8).get_eval_dataloader()
        if bucketed:
            widths = {b[1]["input_ids"].shape[1] for b in loader}
            assert len(widths) > 1, "bucketing produced a single pair shape"
        trainer = RRTrainer(args, model, params)
        return trainer.evaluate(loader, 0)

    m_fixed = run(False, "f")
    m_bucket = run(True, "b")
    for k, v in m_fixed.items():
        assert abs(v - m_bucket[k]) < 1e-6, (k, v, m_bucket[k])
