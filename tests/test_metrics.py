"""Metric parity with the reference formulas (DRT/evaluator/metrics.py:4-59).

Recall/MRR are checked against a direct transcription of the reference loops;
NDCG against the intended per-query dcg/idcg (SURVEY.md §2.2 fix).
"""

import math

import numpy as np

from denseretrievaltoolkits_tpu.evaluator.metrics import get_metrics, mrr, ndcg, recall


def _ref_recall(indices, topk):
    result = [0] * len(topk)
    for indice in indices:
        for pos, hit in enumerate(indice):
            if hit != 0:
                for k in range(len(topk)):
                    if pos < topk[k]:
                        result[k] += 1
                break
    return result


def _ref_mrr(indices, topk):
    result = [0] * len(topk)
    for indice in indices:
        for pos, hit in enumerate(indice):
            if hit != 0:
                for k in range(len(topk)):
                    if pos < topk[k]:
                        result[k] += 1 / (pos + 1)
                break
    return result


def _ref_ndcg_per_query_sum(indices, topk):
    # intended semantics: per-query dcg/idcg, summed over queries
    result = [0.0] * len(topk)
    for indice in indices:
        cnt = sum(1 for x in indice if x)
        for ki, k in enumerate(topk):
            dcg = sum(1.0 / math.log(n + 2) for n, x in enumerate(indice[:k]) if x)
            ideal = min(max(cnt, 1), k)
            idcg = sum(1.0 / math.log(i + 2) for i in range(ideal))
            result[ki] += dcg / idcg
    return result


def test_metrics_vs_reference_loops():
    rng = np.random.default_rng(0)
    hits = (rng.random((50, 20)) < 0.15).astype(np.int8)
    topk = [1, 5, 10, 20]
    np.testing.assert_allclose(recall(hits, topk), _ref_recall(hits.tolist(), topk))
    np.testing.assert_allclose(mrr(hits, topk), _ref_mrr(hits.tolist(), topk), rtol=1e-9)
    np.testing.assert_allclose(
        ndcg(hits, topk), _ref_ndcg_per_query_sum(hits.tolist(), topk), rtol=1e-9
    )


def test_metrics_hand_computed():
    # one query, hit at rank 2 (0-based), depth 5
    hits = np.array([[0, 0, 1, 0, 0]])
    m = get_metrics(hits, [1, 3, 5])
    assert m["Recall@1"] == 0 and m["Recall@3"] == 1 and m["Recall@5"] == 1
    np.testing.assert_allclose(m["MRR@3"], 1 / 3)
    np.testing.assert_allclose(m["MRR@1"], 0)
    # ndcg@3: dcg = 1/ln(4); idcg = 1/ln(2)
    np.testing.assert_allclose(m["NDCG@3"], math.log(2) / math.log(4))


def test_metrics_no_hits():
    hits = np.zeros((3, 5), np.int8)
    m = get_metrics(hits, [5])
    assert m["Recall@5"] == 0 and m["MRR@5"] == 0 and m["NDCG@5"] == 0


def test_get_metrics_keys():
    hits = np.ones((2, 5), np.int8)
    m = get_metrics(hits, [1, 5])
    assert set(m) == {"Recall@1", "Recall@5", "MRR@1", "MRR@5", "NDCG@1", "NDCG@5"}
    assert m["Recall@5"] == 2  # sums, not means
