#!/usr/bin/env python
"""Headline benchmark: query QPS on a flat inner-product index.

North star (BASELINE.md): >10× the reference's CPU query QPS/chip on a large
flat index.  The reference serves brute-force top-k from FAISS IndexFlatIP on
host CPU (``DRT/evaluator/index.py:19``, ``trainer.py:297``); this benchmark
measures our TPU blockwise top-k kernel on an HBM-resident corpus against a
numpy exact-search baseline on this host's CPU (a stand-in for FAISS flat,
same brute-force algorithm).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DOCS", 1_000_000))
DIM = 768
N_QUERIES = 256
TOPK = 100
CPU_SAMPLE_DOCS = 100_000


def bench_tpu(corpus: np.ndarray, queries: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.index.flat import blockwise_topk

    device = jax.devices()[0]
    corpus_dev = jax.device_put(jnp.asarray(corpus, jnp.bfloat16), device)
    queries_dev = jax.device_put(jnp.asarray(queries, jnp.float32), device)

    block = 32768

    def run():
        s, i = blockwise_topk(queries_dev, corpus_dev, TOPK, block)
        return s.block_until_ready(), i

    t0 = time.time()
    run()  # compile + first run
    compile_s = time.time() - t0

    n_iters = 5
    t0 = time.time()
    for _ in range(n_iters):
        run()
    elapsed = (time.time() - t0) / n_iters
    qps = N_QUERIES / elapsed
    print(f"# tpu: {elapsed*1e3:.1f} ms / {N_QUERIES} queries "
          f"(compile {compile_s:.1f} s) on {device}", file=sys.stderr)
    return qps


def bench_cpu_baseline(corpus: np.ndarray, queries: np.ndarray) -> float:
    """numpy brute-force exact top-k on a corpus sample, scaled to N_DOCS."""
    sample = corpus[:CPU_SAMPLE_DOCS]
    t0 = time.time()
    scores = queries @ sample.T
    idx = np.argpartition(-scores, TOPK, axis=1)[:, :TOPK]
    np.take_along_axis(scores, idx, axis=1)
    elapsed = (time.time() - t0) * (N_DOCS / CPU_SAMPLE_DOCS)
    qps = N_QUERIES / elapsed
    print(f"# cpu baseline: {elapsed:.2f} s / {N_QUERIES} queries (scaled)",
          file=sys.stderr)
    return qps


def main():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N_DOCS, DIM), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((N_QUERIES, DIM), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    cpu_qps = bench_cpu_baseline(corpus, queries)
    tpu_qps = bench_tpu(corpus, queries)

    print(json.dumps({
        "metric": f"query_qps_{N_DOCS // 1000}k_docs_top{TOPK}",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
