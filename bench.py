#!/usr/bin/env python
"""Headline benchmark: query QPS on a 1M-doc flat inner-product index.

North star (BASELINE.md): >10× the reference's CPU query QPS/chip on a large
flat index.  The reference serves brute-force top-k from FAISS IndexFlatIP on
host CPU (``DRT/evaluator/index.py:19``, ``trainer.py:297``); here the corpus
lives in HBM as bf16 and the fused Pallas kernel (ops/topk.py) does the tiled
MXU matmul + in-kernel top-J selection, with an exactness-certified merge.

The CPU baseline runs the same brute-force algorithm in numpy (a stand-in for
FAISS flat) on a sample, scaled to the full corpus size.

Timing notes: this host drives the TPU over a relay with ~30-80 ms call
latency, so per-call ``block_until_ready`` timing is meaningless; the bench
dispatches N iterations into the device queue and drains with one readback,
subtracting one measured roundtrip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

N_DOCS = int(os.environ.get("BENCH_DOCS", 1_000_000))
DIM = 768
# serving-batch size: per-dispatch relay overhead on this rig is ~60 ms flat,
# so larger batches measure the device rather than the tunnel
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 2048))
TOPK = 100
CPU_SAMPLE_DOCS = 100_000
ITERS = 20


def bench_tpu(queries: np.ndarray) -> float:
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk

    # generate the corpus ON DEVICE: shipping GBs through the host relay is
    # not part of the serving path (a real index is encoded on device too)
    corpus = jax.jit(
        lambda key: jax.random.normal(key, (N_DOCS, DIM), jnp.bfloat16)
    )(jax.random.key(0))
    corpus.block_until_ready()
    queries_dev = jax.device_put(jnp.asarray(queries, jnp.float32))

    # measured host<->device roundtrip to subtract
    tiny = jnp.ones((1,), jnp.float32)
    for _ in range(3):
        float(jnp.sum(tiny + 1.0))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(tiny + 1.0))
    rt = (time.time() - t0) / 5

    def run():
        return pallas_topk(queries_dev, corpus, TOPK, block_size=2048)

    t0 = time.time()
    s, i = run()  # compile + first run (+ fallback compiles if flagged)
    compile_s = time.time() - t0
    assert i.max() < N_DOCS and i.shape == (N_QUERIES, TOPK)

    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_jit

    # steady-state: dispatch ITERS full searches (kernel + candidate merge),
    # drain with one readback
    qb = queries_dev.astype(jnp.bfloat16)
    pad = (-N_DOCS) % 2048
    corpus_pad = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    out = pallas_topk_jit(qb, corpus_pad, TOPK, 8, 2048, N_DOCS)  # warm
    t0 = time.time()
    for _ in range(ITERS):
        out = pallas_topk_jit(qb, corpus_pad, TOPK, 8, 2048, N_DOCS)
    float(jnp.sum(out[0][0, 0]))  # drain queue
    elapsed = (time.time() - t0 - rt) / ITERS
    qps = N_QUERIES / elapsed
    flops = 2 * N_QUERIES * N_DOCS * DIM
    print(f"# tpu: {elapsed*1e3:.2f} ms / {N_QUERIES} queries "
          f"({flops/elapsed/1e12:.0f} TFLOP/s effective; compile {compile_s:.1f} s; "
          f"roundtrip {rt*1e3:.0f} ms) on {jax.devices()[0]}", file=sys.stderr)
    return qps


def bench_cpu_baseline(sample: np.ndarray, queries: np.ndarray) -> float:
    """numpy brute-force exact top-k on a corpus sample, scaled to N_DOCS."""
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
    global N_DOCS
    rng = np.random.default_rng(0)
    corpus_sample = rng.standard_normal((CPU_SAMPLE_DOCS, DIM), dtype=np.float32)
    queries = rng.standard_normal((N_QUERIES, DIM), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    orig_n = N_DOCS
    cpu_qps = bench_cpu_baseline(corpus_sample, queries)
    try:
        tpu_qps = bench_tpu(queries)
    except Exception as exc:  # transient compile-relay failures: retry smaller
        print(f"# bench at {N_DOCS} docs failed ({type(exc).__name__}: {exc}); "
              f"retrying at {N_DOCS // 4}", file=sys.stderr)
        N_DOCS //= 4
        tpu_qps = bench_tpu(queries)

    # the cpu baseline was scaled to orig_n docs; rescale if the tpu run shrank
    cpu_qps_at_n = cpu_qps * (orig_n / N_DOCS)
    print(json.dumps({
        "metric": f"query_qps_{N_DOCS // 1000}k_docs_top{TOPK}",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps_at_n, 2),
    }))


if __name__ == "__main__":
    main()
