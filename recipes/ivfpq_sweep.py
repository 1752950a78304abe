"""nprobe sweep for the OPQ-chained IVF-PQ at 8.8M (VERDICT r4 #3 tail).

The r5 bench landed `OPQ192x4,IVF256,PQ192x4` at nprobe=32: 2,793 qps @
recall10@100 0.766 — better RECALL than flat OPQ192x4 (0.725) but 0.52x its
qps.  This sweep walks the qps-recall frontier (nprobe in {8,16,32,64}) on
ONE corpus build (trained state + assignment come from bench.py's disk
cache, so the expensive parts are warm), to find whether a low-probe point
beats flat OPQ on BOTH axes or the families split cleanly into
speed-vs-recall niches.

Run on hardware:  python recipes/ivfpq_sweep.py
Prints one JSON line per nprobe point.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from bench import (DIM, N_DOCS_INT8, TOPK, _cache_get, _clustered_chunk,
                       _make_centers, _pq_sample, _roundtrip, _spec_reference)
    from denseretrievaltoolkits_tpu.index.ivf_pq import IVFPQIndex

    spec = _spec_reference()
    ref10 = spec["ref_ids"][:, :10]
    q_np = spec["q_np"]
    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()

    nlist = int(os.environ.get("BENCH_IVFPQ_NLIST", 256))
    tag = "ivfpq_opq192x4"
    rot_c = _cache_get("opq_192x4_v1")
    if rot_c is None:
        from denseretrievaltoolkits_tpu.index.transforms import OPQTransform

        opq = OPQTransform(DIM, M=192, nbits=4)
        opq.train(_pq_sample())
        rot = np.asarray(opq.matrix, np.float32)
    else:
        rot = rot_c["rot"]
    rot_dev = jnp.asarray(rot, jnp.float32)

    idx = IVFPQIndex(DIM, nlist=nlist, nprobe=32, M=192, nbits=4, block=2048)
    idx.bulk_j = int(os.environ.get("BENCH_IVFPQ_J", 8))
    idx.max_hot = int(os.environ.get("BENCH_IVFPQ_MAXHOT", 16))
    cached = _cache_get(f"{tag}_train_v1_nlist{nlist}")
    if cached is not None:
        idx.centroids = jnp.asarray(cached["centroids"])
        idx.codebooks = cached["codebooks"]
        idx._set_codebooks()
    else:
        idx.train(_pq_sample() @ rot, iters=8)

    def spec_chunk(s, r):
        c = _clustered_chunk(centers, s, r)
        out = c * lam[None, :]
        c.delete()
        out2 = jnp.dot(out, rot_dev, preferred_element_type=jnp.float32)
        out.delete()
        return out2

    acache = _cache_get(f"{tag}_assign_v1_nlist{nlist}_n{N_DOCS_INT8}")
    t0 = time.time()
    idx.add_chunks(spec_chunk, N_DOCS_INT8, chunk_rows=500_000,
                   assign=acache["assign"] if acache is not None else None)
    jax.block_until_ready(idx._values)
    print(f"# build {time.time() - t0:.0f}s (warm={acache is not None})",
          file=sys.stderr, flush=True)

    q_rot_np = np.asarray(q_np @ rot, np.float32)
    q_dev = jnp.asarray(q_rot_np, jnp.float32)
    rt = _roundtrip()
    for nprobe in (8, 16, 32, 64):
        _, doc_np = idx.search_bulk(q_rot_np, TOPK, nprobe=nprobe)
        rec = float(np.mean(
            [len(set(a) & set(b)) / 10 for a, b in zip(doc_np, ref10)]))
        el = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                tv, _d = idx.search_bulk_async(q_dev, TOPK, nprobe=nprobe)
            float(jnp.sum(tv[0]))
            el = min(el, (time.time() - t0 - rt) / 3)
        print(json.dumps({
            "metric": f"ivfpq_opq192x4_nprobe{nprobe}_8800k",
            "qps": round(len(q_np) / el, 1),
            "recall10in100": round(rec, 4),
            "vs_int8_serve": round((len(q_np) / el) / spec["int8_qps"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
