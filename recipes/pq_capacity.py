"""Measures the "~100M docs per chip" OPQ192x4 claim instead of extrapolating.

PQ192x4 stores 96 B/row (192 nibble-packed 4-bit codes) — 100M x 768 rows
are 9.6 GB of HBM codes, 2.4x past nibble-packed SQ4's ~42M one-chip
ceiling and 11x past SQ8's ~21M (the memory-ladder table in index/pq.py);
the 4-bit family also serves ~2.7x faster than 8-bit PQ96 at the same
bytes (BASELINE.md r4 sweep).  This recipe builds the real thing on one
v5e: an OPQ-rotated PQ192x4 corpus at 100M rows from the same
power-law-spectrum clustered mixture as the bench (bench._clustered_chunk
is deterministic, so nothing has to coexist with the fp32 corpus), and
serves it with the fused 4-bit decode-and-scan kernel (ops/pq.py).

The exact reference ranking cannot be held on device at this scale (100M x
768 int8 = 77 GB), so it is computed SLAB-WISE like the 38M PCAR recipe
(recipes/bench_pcar_38m.py): the spectrumed int8 reference streams through
HBM one 4M-row slab at a time, each slab's exact top-100 is pulled to
host, and per-query candidates merge by score (reference analog:
multi-shard merge, /root/reference/DRT/model/utils.py:215-229).  Recall is
the candidate-window contract: top-10 of the exact reference found inside
OPQ's top-100 (PQ scores are reconstructions — the rerank contract).

Run on hardware:  python recipes/pq_capacity.py
CPU smoke:        PQCAP_DOCS=200000 PQCAP_QUERIES=16 PQCAP_SLAB=100000 \
                  JAX_PLATFORMS=cpu python recipes/pq_capacity.py
Prints one JSON line with qps + recall10@100 + build timings.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PQCAP_DOCS", 100_000_000))
NQ = int(os.environ.get("PQCAP_QUERIES", 256))
SLAB = int(os.environ.get("PQCAP_SLAB", 4_000_000))
CHUNK = int(os.environ.get("PQCAP_CHUNK", 2_000_000))
M = 192          # 4-bit subquantizers -> M/2 = 96 packed B/row
TOPK = 100
BLOCK = 2048


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # this container's sitecustomize latches the axon TPU plugin over
        # the env var; the config update actually lands
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from bench import DIM, _clustered_chunk, _make_centers, _roundtrip
    from denseretrievaltoolkits_tpu.index.transforms import OPQTransform
    from denseretrievaltoolkits_tpu.ops.pq import (build_bdcb,
                                                   pallas_topk_pq,
                                                   pq_encode_device, pq_train)
    from denseretrievaltoolkits_tpu.ops.quant import quantize_int8_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_scaled

    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    rt = _roundtrip()
    q_np = (np.asarray(_clustered_chunk(centers, 10**9, NQ), np.float32)
            * np.asarray(lam)[None, :])
    q_bf = jnp.asarray(q_np, jnp.bfloat16)
    gran = bench.GEN_GRANULE

    # 1) slab-wise exact int8 reference: stream, search, merge on host
    t_ref = time.time()
    best_s = np.full((NQ, TOPK), -np.inf, np.float32)
    best_i = np.zeros((NQ, TOPK), np.int64)
    for lo in range(0, N, SLAB):
        rows = min(SLAB, N - lo)
        rows_pad = rows + ((-rows) % 2048)
        vals = jnp.zeros((rows_pad, DIM), jnp.int8)
        scs = jnp.ones((rows_pad,), jnp.float32)
        off = 0
        while off < rows:
            r = min(CHUNK, rows - off)
            chunk = _clustered_chunk(centers, lo + off, r) * lam[None, :]
            cv, cs = quantize_int8_device(chunk, block_rows=1024)
            chunk.delete()
            vals = jax.lax.dynamic_update_slice(vals, cv, (off, 0))
            scs = jax.lax.dynamic_update_slice(scs, cs, (off,))
            off += r
        s, i = pallas_topk_serve_scaled(q_bf, vals, scs, TOPK, 16, 2048,
                                        rows, tq=min(512, max(8, NQ)))
        vals.delete(), scs.delete()
        s, i = np.asarray(s), np.asarray(i, np.int64) + lo
        cat_s = np.concatenate([best_s, s], axis=1)
        cat_i = np.concatenate([best_i, i], axis=1)
        pos = np.argsort(-cat_s, axis=1)[:, :TOPK]
        best_s = np.take_along_axis(cat_s, pos, axis=1)
        best_i = np.take_along_axis(cat_i, pos, axis=1)
        print(f"# ref slab {lo // SLAB + 1}/{-(-N // SLAB)} done "
              f"({time.time() - t_ref:.0f}s)", file=sys.stderr, flush=True)
    ref10 = best_i[:, :10]
    t_ref = time.time() - t_ref

    # 2) OPQ rotation + codebooks on a 262k sample
    t_train = time.time()
    sample = np.asarray(_clustered_chunk(centers, 2 * 10**9, 262_144)
                        * lam[None, :])
    opq = OPQTransform(DIM, M=M, nbits=4)
    opq.train(sample)
    rot = jnp.asarray(opq.matrix)
    cb = pq_train(sample @ opq.matrix, M, iters=8, k=16)
    cb_dev = jnp.asarray(cb)
    bdcb = jnp.asarray(build_bdcb(cb))
    t_train = time.time() - t_train

    # 3) encode 100M rows -> [M, n] codes (9.6 GB), chunk-streamed
    t_enc = time.time()
    n_pad = N + ((-N) % BLOCK)
    codes = jnp.zeros((M // 2, n_pad), jnp.int8)  # nibble-packed storage
    off = 0
    while off < N:
        r = min(CHUNK, N - off)
        chunk = _clustered_chunk(centers, off, r) * lam[None, :]
        rotc = jnp.dot(chunk, rot, preferred_element_type=jnp.float32)
        chunk.delete()
        cc = pq_encode_device(rotc, cb_dev)
        rotc.delete()
        codes = jax.lax.dynamic_update_slice(codes, cc, (0, off))
        off += r
        if (off // CHUNK) % 10 == 0:
            print(f"# encoded {off // 1_000_000}M/{N // 1_000_000}M "
                  f"({time.time() - t_enc:.0f}s)", file=sys.stderr, flush=True)
    codes.block_until_ready()
    t_enc = time.time() - t_enc

    # 4) serve timing + window recall
    n_blocks = n_pad // BLOCK
    lam_j = TOPK / n_blocks
    J = max(4, int(np.ceil(lam_j + 4.0 * np.sqrt(lam_j) + 4.0)))
    q_rot = jnp.dot(jnp.asarray(q_np, jnp.float32), rot,
                    preferred_element_type=jnp.float32)
    tq = min(256, max(8, NQ))
    pad_q = (-NQ) % tq
    if pad_q:
        q_rot = jnp.pad(q_rot, ((0, pad_q), (0, 0)))
    out = pallas_topk_pq(q_rot, codes, bdcb, TOPK, J, BLOCK, N, tq=tq,
                         nbits=4)
    el = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            out = pallas_topk_pq(q_rot, codes, bdcb, TOPK, J, BLOCK, N,
                                 tq=tq, nbits=4)
        float(jnp.sum(out[0][0, 0]))
        el = min(el, (time.time() - t0 - rt) / 3)
    ids = np.asarray(out[1])[:NQ]
    recall = float(np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(ids, ref10)]))
    print(json.dumps({
        "metric": f"opq192x4_qps_{N // 1000}k_docs_top{TOPK}",
        "value": round(NQ / el, 1), "unit": "qps",
        "recall10in100": round(recall, 4),
        "hbm_codes_gb": round(n_pad * M // 2 / 2**30, 2),
        "ref_pass_s": round(t_ref), "train_s": round(t_train),
        "encode_s": round(t_enc),
    }), flush=True)

    # 5) the IVF-PQ capacity arm (VERDICT r4 #3): at this scale every flat
    # dense rung (bf16/int8/sq4) is HBM-capacity-excluded, so the question
    # "does probe-pruning ever pay for itself?" is finally answerable —
    # OPQ{M}x4,IVF{nlist},PQ{M}x4 vs the flat OPQ scan above, same rotation,
    # same exact reference.  Skippable via PQCAP_IVFPQ=0.
    if os.environ.get("PQCAP_IVFPQ", "1") != "1":
        return
    codes.delete()
    from denseretrievaltoolkits_tpu.index.ivf_pq import IVFPQIndex

    nlist = int(os.environ.get("PQCAP_NLIST", 1024))
    nprobe = int(os.environ.get("PQCAP_NPROBE", 64))
    idx = IVFPQIndex(DIM, nlist=nlist, nprobe=nprobe, M=M, nbits=4,
                     block=BLOCK)
    idx.bulk_j = int(os.environ.get("PQCAP_J", 8))
    idx.max_hot = int(os.environ.get("PQCAP_MAXHOT", 16))
    t_train2 = time.time()
    idx.train(sample @ opq.matrix, iters=8)
    t_train2 = time.time() - t_train2

    def rot_chunk(s, r):
        chunk = _clustered_chunk(centers, s, r) * lam[None, :]
        out_ = jnp.dot(chunk, rot, preferred_element_type=jnp.float32)
        chunk.delete()
        return out_

    t_build = time.time()
    idx.add_chunks(rot_chunk, N, chunk_rows=CHUNK)
    jax.block_until_ready(idx._values)
    t_build = time.time() - t_build
    print(f"# ivfpq build {t_build:.0f}s "
          f"blocks={int(idx._block_cell.shape[0])}", file=sys.stderr,
          flush=True)

    q_rot_np = np.asarray(q_np @ np.asarray(opq.matrix), np.float32)
    q_dev = jnp.asarray(q_rot_np, jnp.float32)
    probes = [int(p) for p in
              os.environ.get("PQCAP_NPROBES", str(nprobe)).split(",")]
    for np_ in probes:
        _, doc_np = idx.search_bulk(q_rot_np, TOPK, nprobe=np_)
        rec_ivf = float(np.mean(
            [len(set(a) & set(b)) / 10 for a, b in zip(doc_np, ref10)]))
        el2 = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                tv, doc = idx.search_bulk_async(q_dev, TOPK, nprobe=np_)
            float(jnp.sum(tv[0]))
            el2 = min(el2, (time.time() - t0 - rt) / 3)
        print(json.dumps({
            "metric": f"ivfpq_opq{M}x4_qps_{N // 1000}k_docs_top{TOPK}",
            "value": round(NQ / el2, 1), "unit": "qps",
            "recall10in100": round(rec_ivf, 4),
            "nlist": nlist, "nprobe": np_,
            "vs_flat_opq_qps": round((NQ / el2) / (NQ / el), 2),
            "train_s": round(t_train2), "build_s": round(t_build),
        }), flush=True)


if __name__ == "__main__":
    main()
