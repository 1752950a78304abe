"""Measures the "~38M docs per chip" PCAR384,SQ4 claim instead of extrapolating it.

BASELINE.md's PCAR384,SQ4 row (2 bits per original dim, measured at 8.8M)
extrapolates "serves ~38M docs/chip at recall ~0.81".  This recipe builds
the real thing on one v5e: a 38M-row PCAR384,SQ4 corpus (38M x 192 B =
7.3 GB HBM + scales) from the same power-law-spectrum clustered mixture,
and serves it with the packed sq4 kernels (`serve` and native-int8 `i8q`).

The exact reference ranking cannot be held on device at this scale (38M x
768 int8 = 29 GB > 16 GB HBM), so it is computed SLAB-WISE: the spectrumed
int8 reference corpus streams through HBM one 4M-row slab at a time, each
slab's exact top-100 is pulled to host, and per-query candidates merge by
score — the same "corpus axis beyond HBM" discipline the sharded index
uses across chips, here across time (reference analog: multi-shard merge,
/root/reference/DRT/model/utils.py:215-229).

Run on hardware:  python recipes/bench_pcar_38m.py
CPU smoke:        PCAR38M_DOCS=200000 PCAR38M_QUERIES=32 JAX_PLATFORMS=cpu \
                  python recipes/bench_pcar_38m.py
Prints one JSON line with qps + recall@100 for serve and i8q.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PCAR38M_DOCS", 38_000_000))
NQ = int(os.environ.get("PCAR38M_QUERIES", 1024))
SLAB = int(os.environ.get("PCAR38M_SLAB", 4_000_000))
DOUT = 384
TOPK = 100
BLOCK = 2048


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from bench import DIM, _clustered_chunk, _make_centers, _roundtrip
    from denseretrievaltoolkits_tpu.index.transforms import PCATransform
    from denseretrievaltoolkits_tpu.ops.quant import (quantize_int4_device,
                                                      quantize_int8_device)
    from denseretrievaltoolkits_tpu.ops.topk import (pallas_topk_serve_scaled,
                                                     pallas_topk_serve_sq4,
                                                     pallas_topk_serve_sq4_i8q,
                                                     quantize_queries)

    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    rt = _roundtrip()
    tq = min(512, max(8, NQ))

    q_np = np.asarray(_clustered_chunk(centers, 10**9, NQ)) * np.asarray(lam)[None, :]

    place = jax.jit(
        lambda bv, bs, cv, cs, off: (
            jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
            jax.lax.dynamic_update_slice(bs, cs, (off,))),
        donate_argnums=(0, 1))

    # ---- exact reference, slab-streamed (the 768-d corpus never coexists) --
    q8 = jax.device_put(jnp.asarray(q_np, jnp.bfloat16))
    best_scores = np.full((NQ, TOPK), -np.inf, np.float32)
    best_ids = np.full((NQ, TOPK), -1, np.int64)
    t_ref = time.time()
    start = 0
    while start < N:
        rows = min(SLAB, N - start)
        npad = rows + ((-rows) % BLOCK)
        sv = jnp.zeros((npad, DIM), jnp.int8)
        ss = jnp.ones((npad,), jnp.float32)
        off = 0
        while off < rows:
            r = min(500_000, rows - off)
            # start must stay GEN_GRANULE-aligned: SLAB and the chunk step
            # are both multiples of bench.GEN_GRANULE
            chunk = _clustered_chunk(centers, start + off, r) * lam[None, :]
            cv, cs = quantize_int8_device(chunk, block_rows=1024)
            chunk.delete()
            sv, ss = place(sv, ss, cv, cs, off)
            off += r
        sc, ids = pallas_topk_serve_scaled(q8, sv, ss, TOPK, 16, BLOCK, rows,
                                           tq=tq)
        sc = np.asarray(sc, np.float32)
        ids = np.asarray(ids, np.int64) + start
        sv.delete(), ss.delete()
        merged_s = np.concatenate([best_scores, sc], axis=1)
        merged_i = np.concatenate([best_ids, ids], axis=1)
        take = np.argsort(-merged_s, axis=1)[:, :TOPK]
        best_scores = np.take_along_axis(merged_s, take, axis=1)
        best_ids = np.take_along_axis(merged_i, take, axis=1)
        start += rows
        print(f"# ref slab done @{start}/{N} ({time.time() - t_ref:.0f}s)",
              file=sys.stderr, flush=True)
    ref_ids = best_ids

    # ---- PCA train on a 262k sample ----------------------------------------
    sample = np.asarray(_clustered_chunk(centers, 2 * 10**9,
                                         min(262_144, max(4096, N // 8)))
                        * lam[None, :])
    pca = PCATransform(DIM, DOUT, rotate=True)
    pca.train(sample)
    kept = float(np.sum(np.var(sample @ pca.matrix, axis=0))
                 / np.sum(np.var(sample, axis=0)))
    del sample
    W = jnp.asarray(pca.matrix)
    print(f"# pca kept variance {kept:.4f}", file=sys.stderr, flush=True)

    # ---- 38M PCAR384,SQ4 corpus build (7.3 GB at full scale) ---------------
    n = N + ((-N) % BLOCK)
    v4 = jnp.zeros((n, DOUT // 2), jnp.int8)
    s4 = jnp.ones((n,), jnp.float32)
    t_build = time.time()
    off = 0
    while off < n:
        r = min(500_000, n - off)
        chunk = _clustered_chunk(centers, off, r) * lam[None, :]
        t = jnp.dot(chunk, W, preferred_element_type=jnp.float32)
        chunk.delete()
        cv, cs = quantize_int4_device(t, block_rows=1024)
        t.delete()
        v4, s4 = place(v4, s4, cv, cs, off)
        off += r
    v4.block_until_ready()
    build_s = time.time() - t_build
    print(f"# pcar-sq4 corpus built {v4.shape} in {build_s:.0f}s",
          file=sys.stderr, flush=True)

    def bench_fn(fn):
        el = float("inf")
        fn()  # compile
        for _ in range(3):
            t0 = time.time()
            for _ in range(5):
                out = fn()
            jax.block_until_ready(out)
            el = min(el, max(1e-9, (time.time() - t0 - rt) / 5))
        ids = np.asarray(out[1])
        rec = np.mean([len(set(a) & set(b)) / TOPK
                       for a, b in zip(ids, ref_ids)])
        return NQ / el, float(rec)

    qt_f = jnp.dot(jnp.asarray(q_np, jnp.float32), W,
                   preferred_element_type=jnp.float32)
    qt = qt_f.astype(jnp.bfloat16)
    qps_serve, rec_serve = bench_fn(
        lambda: pallas_topk_serve_sq4(qt, v4, s4, TOPK, 4, BLOCK, N, tq=tq))
    print(f"# serve: {qps_serve:.0f} qps recall@100 {rec_serve:.4f}",
          file=sys.stderr, flush=True)

    qi, qs = quantize_queries(qt_f)
    qps_i8q, rec_i8q = bench_fn(
        lambda: pallas_topk_serve_sq4_i8q(qi, v4, s4, qs, TOPK, 4, BLOCK, N,
                                          tq=tq))
    print(f"# i8q:   {qps_i8q:.0f} qps recall@100 {rec_i8q:.4f}",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "n_docs": N, "n_queries": NQ, "dout": DOUT,
        "hbm_gb": round(n * (DOUT // 2 + 4) / 2**30, 2),
        "pca_kept_variance": round(kept, 4), "build_s": round(build_s, 1),
        "serve": {"qps": round(qps_serve, 1), "recall100": round(rec_serve, 4)},
        "i8q": {"qps": round(qps_i8q, 1), "recall100": round(rec_i8q, 4)},
    }))


if __name__ == "__main__":
    main()
