"""Round-2 behaviors: device-native corpus→index flow, streaming eval dumps,
search_mode plumbing, and native int8 index persistence.

These cover the gaps the reference's evaluation pipeline hid behind host/disk
round-trips (DRT/trainer/trainer.py:191-262, 245-261)."""

import glob
import json
import os
import random

import jax
import numpy as np
import pytest

from denseretrievaltoolkits_tpu.config import DataArguments, TrainingArguments
from denseretrievaltoolkits_tpu.data.datasets import CorpusDataset, ExactMatchDataset
from denseretrievaltoolkits_tpu.data.loaders import CorpusDataloader, ExactMatchDataloader
from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex, quantize_int8
from denseretrievaltoolkits_tpu.models.bert import BertConfig
from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
from denseretrievaltoolkits_tpu.parallel.sharded_index import ShardedFlatIndex
from denseretrievaltoolkits_tpu.train.trainer import Trainer

from helpers import make_exactmatch_dataset, make_tokenizer


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("r2")
    tokenizer = make_tokenizer(tmp)
    rng = random.Random(1)
    data_dir, corpus_path, _, _ = make_exactmatch_dataset(
        tmp, rng, n_train=8, n_eval=6, n_corpus=24, n_neg=3
    )
    data_args = DataArguments(
        data_dir=data_dir, corpus_path=corpus_path,
        train_n_passages=2, q_max_len=16, p_max_len=24,
        data_cache_dir=str(tmp / "hfcache"),
    )
    bert_config = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=48,
    )
    return tmp, tokenizer, data_args, bert_config


def _make_trainer(pipeline, out_name, **train_kwargs):
    tmp, tokenizer, data_args, bert_config = pipeline
    defaults = dict(
        output_dir=str(tmp / out_name / "out"),
        cache_train_dir=str(tmp / out_name / "cache"),
        train_batch_size=4, eval_batch_size=4, corpus_batch_size=8,
        max_epochs=1, eval_per_train=1, save_per_train=1,
        learning_rate=1e-3, optimizer="adamw", topk="1,5",
        retrieve_num=5, log_every=0,
    )
    defaults.update(train_kwargs)
    train_args = TrainingArguments(**defaults)
    model = DRModel(DRModelSpec(bert_config=bert_config))
    params = model.init_params(jax.random.key(0))
    dataset = ExactMatchDataset(data_args, tokenizer)
    sampler = RandomSampleNegatives(data_args, seed=0)
    factory = ExactMatchDataloader(data_args, dataset, tokenizer, sampler,
                                   batch_size=[4, 4, 4])
    train_dl, eval_dl, _ = factory.get_dataloader()
    corpus = CorpusDataset(data_args, tokenizer)
    corpus_dl = CorpusDataloader(
        data_args, corpus, tokenizer, batch_size=train_args.corpus_batch_size
    ).get_dataloader()
    return Trainer(train_args, model, params, corpus_dataloader=corpus_dl,
                   train_loader=train_dl, eval_loader=eval_dl), train_args, eval_dl


def test_corpus_encode_is_device_native(pipeline):
    """_encoding_corpus must feed the index through add_device slabs — no
    full-corpus host fp32 staging (the round-1 scale cap)."""
    trainer, train_args, eval_dl = _make_trainer(pipeline, "devnative")
    trainer._encoding_corpus(1)
    index = trainer.index
    assert isinstance(index, FlatIPIndex)
    assert index._device_slabs, "corpus did not take the device-native add path"
    assert not index._chunks, "host staging chunks should be empty"
    # the streamed npy artifact must equal a fresh re-encode (same params)
    npy = np.load(os.path.join(train_args.encode_corpus_dir, "1.0.npy"))
    assert npy.shape[0] == len(index) == len(trainer.idx)
    slab_rows = np.concatenate(
        [np.asarray(v[:n], np.float32) for v, _, n in index._device_slabs])
    np.testing.assert_allclose(npy, slab_rows, rtol=1e-5, atol=1e-5)
    # search over the slab path agrees with a host-staged exact index
    q = npy[:4] + 0.01
    ref = FlatIPIndex(npy.shape[1])
    ref.add(npy)
    s1, i1 = index.search(q, 5)
    s2, i2 = ref.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_eval_streams_dump_and_metrics(pipeline):
    """evaluate writes the retrieval jsonl incrementally and computes the
    same metric keys; approx search_mode is reachable from config."""
    trainer, train_args, eval_dl = _make_trainer(
        pipeline, "approx", search_mode="approx")
    metrics = trainer.evaluate(eval_dl, 1)
    assert set(k for k in metrics if "@" in k) == {
        f"{m}@{k}" for m in ("MRR", "NDCG", "Recall") for k in (1, 5)}
    dump = os.path.join(train_args.retrieve_dir, "1.0.json")
    rows = [json.loads(l) for l in open(dump)]
    assert rows and {"doc_id", "query_id", "score"} <= set(rows[0])
    # every query contributed retrieve_num rows (streaming wrote them all)
    n_queries = metrics["query_num"]
    assert len(rows) == n_queries * min(train_args.retrieve_num, len(trainer.index))


def test_flat_int8_native_persistence(tmp_path):
    rng = np.random.default_rng(0)
    reps = rng.normal(size=(100, 16)).astype(np.float32)
    idx = FlatIPIndex(16, dtype="int8", block_size=32)
    idx.add_device(jax.numpy.asarray(reps))
    idx.docid = [f"d{i}" for i in range(100)]
    path = str(tmp_path / "int8idx")
    idx.save(path)
    with np.load(path + ".npz") as z:
        assert "values" in z and "reps" not in z
        assert z["values"].dtype == np.int8
        assert z["values"].shape == (100, 16)
    loaded = FlatIPIndex.load(path)
    assert loaded.docid == idx.docid and len(loaded) == 100
    # bit-identical int8 payload: no fp32 materialization, no requantization
    orig_v = np.concatenate([np.asarray(v[:n], np.int8)
                             for v, _, n in idx._device_slabs])
    load_v = np.concatenate([np.asarray(v[:n], np.int8)
                             for v, _, n in loaded._device_slabs])
    np.testing.assert_array_equal(orig_v, load_v)
    s1, i1 = idx.search(reps[:5], 10)
    s2, i2 = loaded.search(reps[:5], 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_flat_int8_host_chunks_save_native(tmp_path):
    """Host-staged int8 indexes also persist natively (quantized once)."""
    rng = np.random.default_rng(1)
    reps = rng.normal(size=(60, 8)).astype(np.float32)
    idx = FlatIPIndex(8, dtype="int8")
    idx.add(reps)
    path = str(tmp_path / "hostint8")
    idx.save(path)
    with np.load(path + ".npz") as z:
        vals, scales = quantize_int8(reps)
        np.testing.assert_array_equal(z["values"], vals)
        np.testing.assert_allclose(z["scales"], scales)
    loaded = FlatIPIndex.load(path)
    s1, i1 = idx.search(reps[:4], 5)
    s2, i2 = loaded.search(reps[:4], 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_sharded_int8_native_persistence(tmp_path):
    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(2)
    reps = rng.normal(size=(131, 16)).astype(np.float32)
    idx = ShardedFlatIndex(mesh, 16, dtype="int8", block_size=32)
    idx.add(reps)
    idx.docid = [f"d{i}" for i in range(131)]
    s0, i0 = idx.search(reps[:5], 7)
    path = str(tmp_path / "shardint8")
    idx.save(path)
    with np.load(path + ".npz") as z:
        assert "values" in z and z["values"].dtype == np.int8
        assert z["values"].shape == (131, 16)
    loaded = ShardedFlatIndex.load(path, mesh)
    assert loaded.docid == idx.docid and len(loaded) == 131
    # placed straight on the mesh: int8 dtype, sharded over the data axis
    assert loaded._corpus.dtype == np.int8
    assert loaded._corpus.sharding.spec[0] == "data"
    s1, i1 = loaded.search(reps[:5], 7)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-6)


def test_sharded_search_mode_kwarg(tmp_path):
    mesh = make_mesh(4, 1)
    rng = np.random.default_rng(3)
    reps = rng.normal(size=(96, 8)).astype(np.float32)
    idx = ShardedFlatIndex(mesh, 8, block_size=16)
    idx.add(reps)
    s_e, i_e = idx.search(reps[:3], 5, mode="exact")
    s_a, i_a = idx.search(reps[:3], 5, mode="approx")
    # on CPU the approx path serves exact results through the scan
    np.testing.assert_array_equal(i_e, i_a)
    np.testing.assert_allclose(s_e, s_a, rtol=1e-6)
