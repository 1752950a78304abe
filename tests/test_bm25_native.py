"""Native C++ BM25 engine vs the Python reference implementation."""

import random
import time

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.evaluator.bm25 import BM25Retriever

native = pytest.importorskip("denseretrievaltoolkits_tpu.evaluator.bm25_native")
if not native.native_available():
    pytest.skip("g++/native build unavailable", allow_module_level=True)


def _corpus(rng, n_samples=40, vocab=200):
    corpus = []
    for _ in range(n_samples):
        corpus.append(
            {
                "positives": [
                    [rng.randrange(vocab) for _ in range(rng.randrange(5, 20))]
                ],
                "negatives": [
                    [rng.randrange(vocab) for _ in range(rng.randrange(5, 20))]
                    for _ in range(3)
                ],
            }
        )
    return corpus


def test_native_matches_python_ranking():
    rng = random.Random(0)
    corpus = _corpus(rng)
    py = BM25Retriever(topK=5)
    nat = native.NativeBM25Retriever(topK=5)
    bp_py, ep_py = py.load_passages(corpus)
    bp_nat, ep_nat = nat.load_passages(corpus)
    assert bp_py == bp_nat and ep_py == ep_nat

    for _ in range(20):
        q = [rng.randrange(200) for _ in range(6)]
        ids_py = py.search(q, 10)
        ids_nat = nat.search(q, 10)
        # scores must agree; ordering ties may differ → compare score values
        def score(r, ids):
            return [sum(r._score_term(w, d) for w in q if d in r.doc_contained_word.get(w, ()))
                    for d in ids]
        s_py = np.array(score(py, ids_py))
        s_nat = np.array(score(py, ids_nat))
        np.testing.assert_allclose(np.sort(s_py)[::-1], np.sort(s_nat)[::-1], atol=1e-4)


def test_native_exclusion_range():
    rng = random.Random(1)
    corpus = _corpus(rng, n_samples=10)
    nat = native.NativeBM25Retriever(topK=5)
    bp, ep = nat.load_passages(corpus)
    q = corpus[0]["positives"][0]  # query == own positive: would rank itself first
    ids_excl = nat.search(q, 5, exclude=(bp[0], ep[0]))
    assert all(not (bp[0] <= d < ep[0]) for d in ids_excl)


def test_native_batch_search():
    rng = random.Random(2)
    corpus = _corpus(rng, n_samples=30)
    nat = native.NativeBM25Retriever(topK=5)
    nat.load_passages(corpus)
    queries = [[rng.randrange(200) for _ in range(5)] for _ in range(8)]
    batch = nat.search_batch(queries, k=7)
    assert batch.shape == (8, 7)
    for qi, q in enumerate(queries):
        single = nat.search(q, 7)
        want = [d for d in batch[qi] if d >= 0]
        assert single[: len(want)] == want


def test_native_speedup_smoke():
    """Native engine should beat the Python dicts by a wide margin."""
    rng = random.Random(3)
    corpus = _corpus(rng, n_samples=400, vocab=500)
    queries = [[rng.randrange(500) for _ in range(8)] for _ in range(100)]

    py = BM25Retriever(topK=5)
    py.load_passages(corpus)
    t0 = time.time()
    for q in queries:
        py.search(q, 10)
    t_py = time.time() - t0

    nat = native.NativeBM25Retriever(topK=5)
    nat.load_passages(corpus)
    t0 = time.time()
    for q in queries:
        nat.search(q, 10)
    t_nat = time.time() - t0
    assert t_nat < t_py  # typically 10-100x; any win passes
