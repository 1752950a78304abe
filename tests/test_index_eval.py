"""Flat index exactness, dtype variants, persistence; nq_eval; TREC; BM25."""

import json

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.evaluator.bm25 import BM25Retriever
from denseretrievaltoolkits_tpu.evaluator.nq_eval import (
    SimpleTokenizer,
    evaluate_retrieval,
    has_answers,
)
from denseretrievaltoolkits_tpu.evaluator.trec import (
    load_from_trec,
    merge_retrieval_results_by_score,
    save_as_trec,
)
from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex, blockwise_topk, quantize_int8


def _corpus(rng, n, d):
    return rng.normal(size=(n, d)).astype(np.float32)


def test_blockwise_topk_exact_vs_numpy():
    rng = np.random.default_rng(0)
    corpus = _corpus(rng, 1000, 32)
    q = _corpus(rng, 7, 32)
    scores, indices = blockwise_topk(q, corpus, k=13, block_size=256)
    full = q @ corpus.T
    ref_idx = np.argsort(-full, axis=1)[:, :13]
    ref_scores = np.take_along_axis(full, ref_idx, axis=1)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(indices), ref_idx)


def test_blockwise_topk_nondivisible_and_valid_mask():
    rng = np.random.default_rng(1)
    corpus = _corpus(rng, 777, 16)  # not a multiple of block
    q = _corpus(rng, 3, 16)
    scores, indices = blockwise_topk(q, corpus, k=5, block_size=128)
    full = q @ corpus.T
    ref_idx = np.argsort(-full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(indices), ref_idx)
    assert np.asarray(indices).max() < 777


def test_index_search_matches_bruteforce():
    rng = np.random.default_rng(2)
    corpus = _corpus(rng, 500, 24)
    q = _corpus(rng, 4, 24)
    index = FlatIPIndex(24)
    index.add(corpus[:200])
    index.add(corpus[200:])
    assert len(index) == 500
    scores, indices = index.search(q, k=10)
    full = q @ corpus.T
    np.testing.assert_array_equal(indices, np.argsort(-full, axis=1)[:, :10])
    # sorted descending
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_index_bf16_close():
    rng = np.random.default_rng(3)
    corpus = _corpus(rng, 400, 32)
    q = _corpus(rng, 4, 32)
    exact = FlatIPIndex(32)
    exact.add(corpus)
    bf16 = FlatIPIndex(32, dtype="bfloat16")
    bf16.add(corpus)
    _, idx_exact = exact.search(q, 10)
    _, idx_bf16 = bf16.search(q, 10)
    # bf16 keeps most of the top-10 (allowing borderline swaps)
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(idx_exact, idx_bf16)])
    assert overlap >= 8


def test_index_int8_recall():
    rng = np.random.default_rng(4)
    corpus = _corpus(rng, 400, 32)
    q = _corpus(rng, 4, 32)
    values, scales = quantize_int8(corpus)
    recon = values.astype(np.float32) * scales[:, None]
    assert np.abs(recon - corpus).max() < np.abs(corpus).max() / 64
    int8 = FlatIPIndex(32, dtype="int8")
    int8.add(corpus)
    exact = FlatIPIndex(32)
    exact.add(corpus)
    _, idx_exact = exact.search(q, 10)
    _, idx_int8 = int8.search(q, 10)
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(idx_exact, idx_int8)])
    assert overlap >= 7


def test_index_save_load(tmp_path):
    rng = np.random.default_rng(5)
    corpus = _corpus(rng, 100, 16)
    index = FlatIPIndex(16)
    index.add(corpus)
    index.docid = [f"d{i}" for i in range(100)]
    path = str(tmp_path / "idx" / "flat")
    index.save(path)
    loaded = FlatIPIndex.load(path)
    assert loaded.docid == index.docid and len(loaded) == 100
    q = _corpus(rng, 2, 16)
    np.testing.assert_array_equal(index.search(q, 5)[1], loaded.search(q, 5)[1])


def test_batch_search():
    rng = np.random.default_rng(6)
    corpus = _corpus(rng, 300, 16)
    q = _corpus(rng, 10, 16)
    index = FlatIPIndex(16)
    index.add(corpus)
    s1, i1 = index.search(q, 7)
    s2, i2 = index.batch_search(q, 7, batch_size=3)
    np.testing.assert_array_equal(i1, i2)


# --- nq_eval -----------------------------------------------------------------


def test_has_answers_token_match():
    assert has_answers("The capital of France is Paris.", ["paris"])
    assert has_answers("The capital of France is Paris.", ["is Paris"])
    assert not has_answers("The capital of France is Paris.", ["London"])
    # token-sequence, not substring: 'par' shouldn't match 'Paris'
    assert not has_answers("The capital of France is Paris.", ["par"])


def test_has_answers_unicode_and_regex():
    assert has_answers("Café com leite", ["café"])
    assert has_answers("born in 1956, died 2001", ["19[0-9]{2}"], regex=True)
    assert not has_answers("plain text", ["[invalid("], regex=True)


def test_simple_tokenizer():
    words = SimpleTokenizer().tokenize("Hello, world! it's 42").words(uncased=True)
    assert words == ["hello", ",", "world", "!", "it", "'", "s", "42"]


def test_evaluate_retrieval_cli(tmp_path):
    retrieval = {
        "q1": {
            "answers": ["paris"],
            "contexts": [
                {"text": "t\nnothing here"},
                {"text": "t\nthe answer is paris indeed"},
            ],
        },
        "q2": {"answers": ["tokyo"], "contexts": [{"has_answer": True}]},
    }
    path = tmp_path / "retrieval.json"
    path.write_text(json.dumps(retrieval))
    acc = evaluate_retrieval(str(path), [1, 2])
    assert acc[1] == 0.5  # only q2 hits at rank 1
    assert acc[2] == 1.0


# --- TREC --------------------------------------------------------------------


def test_trec_roundtrip(tmp_path):
    run = {"q1": {"d1": 2.5, "d2": 1.5}, "q2": {"d3": 0.5}}
    path = str(tmp_path / "run.trec")
    save_as_trec(run, path)
    loaded = load_from_trec(path)
    assert loaded == run
    as_list = load_from_trec(path, as_list=True)
    assert as_list["q1"][0] == ("d1", 2.5)


def test_merge_retrieval_results():
    r1 = {"q1": {"d1": 3.0, "d2": 1.0}}
    r2 = {"q1": {"d3": 2.0}, "q2": {"d4": 5.0}}
    merged = merge_retrieval_results_by_score([r1, r2], topk=2)
    assert list(merged["q1"]) == ["d1", "d3"]
    assert merged["q2"] == {"d4": 5.0}


# --- BM25 correctness --------------------------------------------------------


def test_bm25_ranks_matching_doc_first():
    corpus = [
        {"positives": [[1, 2, 3]], "negatives": [[4, 5, 6], [7, 8, 9]]},
        {"positives": [[10, 11]], "negatives": [[1, 4, 7]]},
    ]
    bm25 = BM25Retriever(topK=2)
    bp, ep = bm25.load_passages(corpus)
    assert bp == [0, 3] and ep == [1, 4]
    # query [10, 11] should rank passage 3 ([10,11]) first
    result = bm25.search([10, 11], k=3)
    assert result[0] == 3
    # per-doc term counts are independent (reference aliasing bug fixed)
    assert bm25.cnt[0] != bm25.cnt[1]


def test_bm25_search_pads_to_k():
    corpus = [{"positives": [[1, 2]], "negatives": [[3, 4], [5, 6]]}]
    bm25 = BM25Retriever(topK=2)
    bm25.load_passages(corpus)
    result = bm25.search([1], k=3)
    assert len(result) == 3 and len(set(result)) == 3


def test_bm25_retrieve_subset():
    corpus = [{"positives": [[1, 2, 3]], "negatives": [[4, 5], [1, 1, 1, 1]]}]
    bm25 = BM25Retriever(topK=1)
    bm25.load_passages(corpus)
    order = bm25.retrieve([1], [[4, 5], [1, 1, 1, 1], [2, 3]])
    assert order[0] == 1  # doc with most query-term occurrences


def test_add_device_slab_path():
    """Device-native add: per-slab search + merge matches brute force."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(700, 32)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    for dtype in ("float32", "int8"):
        index = FlatIPIndex(32, dtype=dtype, block_size=128)
        index.add_device(jnp.asarray(corpus[:300]))
        index.add_device(jnp.asarray(corpus[300:]))
        assert len(index) == 700
        scores, indices = index.search(q, 10)
        full = q @ corpus.T
        ref = np.argsort(-full, axis=1)[:, :10]
        if dtype == "float32":
            np.testing.assert_array_equal(indices, ref)
        else:
            overlap = np.mean([len(set(a) & set(b)) for a, b in zip(indices, ref)])
            assert overlap >= 8
        assert indices.max() < 700

    with pytest.raises(AssertionError):
        index.add(corpus)  # mixing host/device adds is rejected


def test_index_factory_strings():
    from denseretrievaltoolkits_tpu.index.flat import index_factory

    assert index_factory(8, "Flat").dtype == "float32"
    assert index_factory(8, "SQ8").dtype == "int8"
    assert index_factory(8, "BF16").dtype == "bfloat16"
    with pytest.raises(ValueError):
        index_factory(8, "IVF4096,PQ64")


def test_search_approx_mode():
    rng = np.random.default_rng(8)
    corpus = _corpus(rng, 600, 32)
    q = _corpus(rng, 4, 32)
    index = FlatIPIndex(32)
    index.add(corpus)
    s, i = index.search(q, 10, mode="approx")
    full = q @ corpus.T
    ref = np.argsort(-full, axis=1)[:, :10]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref)])
    assert overlap >= 8  # CPU lowering is near-exact; TPU ~recall_target


def test_retrieval_dump_converters(tmp_path):
    from denseretrievaltoolkits_tpu.evaluator.convert import (
        retrieval_jsonl_to_nq_json,
        retrieval_jsonl_to_trec,
    )
    from denseretrievaltoolkits_tpu.evaluator.nq_eval import evaluate_retrieval

    rows = [
        {"doc_id": "d1", "query_id": "q1", "query": "who", "document": "the answer is paris",
         "answers": ["paris"], "score": 2.0},
        {"doc_id": "d2", "query_id": "q1", "query": "who", "document": "nothing here",
         "answers": ["paris"], "score": 1.0},
        {"doc_id": "d3", "query_id": "q2", "query": "what", "document": "plain text",
         "answers": ["tokyo"], "score": 0.5},
    ]
    dump = tmp_path / "1.0.json"
    with open(dump, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    nq_path = str(tmp_path / "retrieval.json")
    retrieval_jsonl_to_nq_json(str(dump), nq_path)
    acc = evaluate_retrieval(nq_path, [1, 2])
    assert acc[1] == 0.5 and acc[2] == 0.5  # q1 hits at rank 1, q2 never

    trec_path = str(tmp_path / "run.trec")
    retrieval_jsonl_to_trec(str(dump), trec_path)
    from denseretrievaltoolkits_tpu.evaluator.trec import load_from_trec

    run = load_from_trec(trec_path)
    assert run["q1"] == {"d1": 2.0, "d2": 1.0} and "q2" in run
