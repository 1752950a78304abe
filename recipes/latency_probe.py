"""Small-batch latency: flat-serve vs IVF bulk vs LEGACY PROBE mode at 2M.

VERDICT r3 weak 4 asked for the B=1/8/64 latency surface including the
legacy per-query probe path (``IVFFlatIndex`` ``mode="probe"`` — the
gathered-einsum kernel hypothesized to win tiny batches).  The probe path
runs on the fixed-capacity cell layout, which needs capacity_factor x
corpus bytes — >= 13.6 GB at 8.8M int8, out of a v5e's 16 GB HBM — so the
three-way comparison runs here at 2M rows (6.8 GB total across the three
structures, built sequentially with deletes between arms).  The 8.8M
flat-vs-bulk latency rows live in bench.py (`serve_latency_ms_b*` /
`ivf_latency_ms_b*`).

Run on hardware:  python recipes/latency_probe.py
Prints one JSON line: {"b": {"1": {"flat": ms, "bulk": ms, "probe": ms}, ...}}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("LAT_DOCS", 2_000_000))
DIM = 768
TOPK = 100
BATCHES = (1, 8, 64)
NLIST = int(os.environ.get("LAT_NLIST", 256))
NPROBE = int(os.environ.get("LAT_NPROBE", 8))


def p50(fn, rt, n=20):
    import bench

    # one timing/clamping implementation for the 2M and 8.8M rows
    return bench._p50_latency_ms(fn, rt, n=n)


def main():
    import jax
    import jax.numpy as jnp

    import bench  # shared clustered generator + roundtrip estimate

    centers = bench._make_centers()
    rt = bench._roundtrip()
    q_np = np.asarray(bench._clustered_chunk(centers, 10**9, 64))
    out = {str(b): {} for b in BATCHES}

    # --- arm 1: flat packed-serve kernel --------------------------------------
    from denseretrievaltoolkits_tpu.ops.quant import quantize_int8_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_scaled

    block = 2048
    n = N_DOCS + ((-N_DOCS) % block)
    # chunk-at-a-time build (same pattern as bench.bench_int8): a one-shot
    # 2M fp32 generate + quantize peaks >16 GB (concat doubles the fp32
    # corpus before the int8 copy exists) and OOMs the chip
    values = jnp.zeros((n, DIM), jnp.int8)
    scales = jnp.ones((n,), jnp.float32)
    place = jax.jit(
        lambda bv, bs, cv, cs, off: (
            jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
            jax.lax.dynamic_update_slice(bs, cs, (off,))),
        donate_argnums=(0, 1))
    off = 0
    while off < n:
        r = min(500_000, n - off)
        chunk = bench._clustered_chunk(centers, off, r)
        cv, cs = quantize_int8_device(chunk, block_rows=1024)
        chunk.delete()
        values, scales = place(values, scales, cv, cs, off)
        off += r
    values.block_until_ready()
    for b in BATCHES:
        pad = max(8, b)
        qb = jax.device_put(jnp.asarray(q_np[:pad], jnp.bfloat16))
        fn = lambda qb=qb, pad=pad: pallas_topk_serve_scaled(
            qb, values, scales, TOPK, 4, block, N_DOCS, tq=pad)
        jax.block_until_ready(fn())
        out[str(b)]["flat"] = round(p50(fn, rt), 2)
        print(f"# flat B={b}: {out[str(b)]['flat']} ms", file=sys.stderr)
    values.delete(), scales.delete()

    # --- arm 2: ragged IVF bulk (product path, per-B tuned) -------------------
    from denseretrievaltoolkits_tpu.index.ivf import IVFFlatIndex, IVFRaggedIndex

    ragged = IVFRaggedIndex(DIM, nlist=NLIST, nprobe=NPROBE, dtype="int8",
                            block=2048)
    sample = bench._clustered_chunk(centers, 2 * 10**9, 262_144)
    ragged.train(sample, iters=8)
    sample.delete()
    ragged.add_chunks(lambda s, r: bench._clustered_chunk(centers, s, r),
                      N_DOCS, chunk_rows=500_000)
    for b in BATCHES:
        ragged._bulk_state = None
        qb = np.ascontiguousarray(q_np[:b])
        ragged.search_bulk(qb, TOPK, nprobe=NPROBE)
        out[str(b)]["bulk"] = round(
            p50(lambda qb=qb: ragged.search_bulk(qb, TOPK, nprobe=NPROBE), rt), 2)
        print(f"# bulk B={b}: {out[str(b)]['bulk']} ms", file=sys.stderr)
    cents = ragged.centroids
    for a in (ragged._values, ragged._scales, ragged._row_ids,
              ragged._block_cell, ragged._block_start):
        if a is not None:
            a.delete()

    # --- arm 3: legacy probe mode (fixed-capacity layout, gathered einsum) ---
    probe_idx = IVFFlatIndex(DIM, nlist=NLIST, nprobe=NPROBE, dtype="int8")
    probe_idx.centroids = cents  # same centroids -> same probe set
    probe_idx.add_chunks(lambda s, r: bench._clustered_chunk(centers, s, r),
                         N_DOCS, chunk_rows=500_000)
    for b in BATCHES:
        qb = np.ascontiguousarray(q_np[:b])
        probe_idx.search(qb, TOPK, mode="probe", nprobe=NPROBE)  # compile
        out[str(b)]["probe"] = round(
            p50(lambda qb=qb: probe_idx.search(qb, TOPK, mode="probe",
                                               nprobe=NPROBE), rt), 2)
        print(f"# probe B={b}: {out[str(b)]['probe']} ms", file=sys.stderr)

    print(json.dumps({"n_docs": N_DOCS, "nlist": NLIST, "nprobe": NPROBE,
                      "p50_ms": out}))


if __name__ == "__main__":
    main()
