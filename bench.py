#!/usr/bin/env python
"""Headline + regression benchmarks, printed as ONE JSON line.

Headline (BASELINE.md north star): query QPS on a 1M-doc flat inner-product
index. The reference serves brute-force top-k from FAISS IndexFlatIP on host
CPU (``DRT/evaluator/index.py:19``, ``trainer.py:297``); here the corpus
lives in HBM as bf16 and the fused Pallas kernel (ops/topk.py) does the tiled
MXU matmul + in-kernel top-J selection.

The single stdout line keeps the driver schema
``{"metric", "value", "unit", "vs_baseline"}`` for the headline and carries
the other tracked metrics in ``"extras"`` (same per-metric schema), so every
hot path is machine-checkable round over round (VERDICT r1 item 9):

  - query_qps_1000k_docs_serve — packed-selection serving path
    (search_mode='serve') on the same 1M bf16 corpus (vs_baseline = CPU)
  - query_qps_int8_8800k_docs_top100 — MS MARCO-scale int8 HBM index, fused
    in-kernel dequant (vs_baseline = ratio to the round-1 measurement);
    corpus is a clustered 4096-component mixture (throughput-identical for
    the exact kernel, and the IVF bench shares its exact reference)
  - ivf_qps_int8_8800k_docs_top100 — trained IVF, cell-major bulk kernel on
    the SAME corpus (vs_baseline = ratio to this run's exact-int8 QPS — the
    number IVF must beat); companion ivf_recall100_int8_8800k vs the exact
    reference (vs_baseline = recall/0.98 target)
  - query_qps_int4_21000k_docs_serve — 21M-passage nibble-packed sq4 corpus,
    packed SERVE kernel (selection exact up to the packing quantum; the
    certified-exact sq4 path is pallas_topk(int4=True))
  - pcar384sq4_qps_8800k_docs_top100 — trained PCAR384,SQ4 factory chain
    (2 bits per original dim, 4x less HBM than int8) on a power-law-spectrum
    mixture; vs_baseline = ratio to the same session's spectrumed exact-int8
    serve; companion recall rows vs that exact reference (target 0.81)
  - train_step_ms_bertbase — bert-base dual-encoder adamw step, 32 q / 64 p
    x156 tok bf16 (vs_baseline = round-1 ms / current ms; >1 is faster)
  - encode_passages_per_s — bert-base corpus encode, batch 256 seq 156
    (vs_baseline = ratio to round 1)
  - encode_passages_per_s_varlen_bucketed — realistic variable-length corpus
    (lognormal, median ~70 tok) through the bucketed pipeline
    (--bucketed_encode); vs_baseline = ratio to the fixed-p_max padding arm
    measured the same session (companion _fixedpad row)

CPU baseline for the headline runs the same brute-force algorithm in numpy
(a stand-in for FAISS flat) on a sample, scaled to the full corpus size.

Timing notes: this host drives the TPU over a relay with ~30-80 ms call
latency, so per-call ``block_until_ready`` timing is meaningless; the bench
dispatches N iterations into the device queue and drains with one readback,
subtracting one measured roundtrip.
"""

import functools
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
# the CPU baseline is a scaled FAISS-flat stand-in; 25k rows keeps its wall
# cost ~20 s on this container's shared core (it measured 78-260 s at 100k)
CPU_SAMPLE_DOCS = 25_000
ITERS = 20

# int8 regression config (round-1 conditions: BASELINE.md "8.8M int8" row)
N_DOCS_INT8 = int(os.environ.get("BENCH_DOCS_INT8", 8_800_000))
N_QUERIES_INT8 = 256
INT8_CHUNK = 500_000  # staging chunk while building the int8 corpus
# (a GEN_GRANULE multiple: the clustered generator's values must not depend
# on chunk boundaries — see _clustered_chunk)

# int4 flagship scale: the reference's 21M-passage Wikipedia corpus
# (run.sh:13-14) on ONE chip (~8 GB HBM nibble-packed)
N_DOCS_INT4 = int(os.environ.get("BENCH_DOCS_INT4", 21_000_000))

# round-1 measured values (BASELINE.md) — the regression denominators
R1_INT8_QPS = 4959.0
R1_TRAIN_STEP_MS = 134.0
R1_ENCODE_PPS = 2799.0

# ---------------------------------------------------------------------------
# Wall-clock budget (VERDICT r4 #1): the r04 driver capture died at rc=124
# mid-OPQ because the arm list outgrew the driver's timeout.  The bench now
# runs core arms first and gates each expensive arm on the remaining budget
# (estimated arm cost, cold vs warm cache), so the final JSON line ALWAYS
# lands.  BENCH_BUDGET_S=0 disables gating (run everything).
_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1380))


def _remaining() -> float:
    if BUDGET_S <= 0:
        return float("inf")
    return BUDGET_S - (time.monotonic() - _T0)


def _gate(name: str, est_s: float) -> bool:
    """True if the arm fits; logs the decision either way."""
    rem = _remaining()
    ok = rem > est_s
    print(f"# budget: {name} est {est_s:.0f}s, remaining "
          f"{min(rem, 9e6):.0f}s -> {'run' if ok else 'SKIP'}",
          file=sys.stderr)
    return ok


# Disk cache for trained artifacts (VERDICT r4 #1: "cache built indexes to
# disk across runs").  Everything cached here is a deterministic function of
# the fixed bench seeds (centers key 77, sample offset 2e9, lam exponent
# -0.35), so reuse across processes is exact.  Gitignored; delete the dir to
# retrain.  Keys carry a version tag — bump it when a generator changes.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache")


def _cache_get(name: str):
    path = os.path.join(_CACHE_DIR, name + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    except Exception as exc:
        print(f"# cache read {name} failed: {exc}", file=sys.stderr)
        return None


def _cache_put(name: str, **arrays) -> None:
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        path = os.path.join(_CACHE_DIR, name + ".npz")
        np.savez(path + ".tmp.npz", **arrays)
        os.replace(path + ".tmp.npz", path)
        print(f"# cache write {name}", file=sys.stderr)
    except OSError as exc:
        print(f"# cache write {name} failed: {exc}", file=sys.stderr)


def _tpu_reachable(timeout_s: int = 240, attempts: int | None = None,
                   wait_s: int | None = None) -> bool:
    """Probe the device in a SUBPROCESS under a hard timeout: when the
    relay/tunnel is wedged, even backend init blocks forever inside gRPC —
    uninterruptible in-process. A dead probe lets the bench emit a parseable
    error record instead of hanging the driver.

    Retries with a wait between attempts (VERDICT r3 #1): the relay outage
    that nulled BENCH_r03 was transient, and a single 240 s probe at exactly
    the wrong moment erased the round's whole measured story.  Defaults: 5
    attempts, 240 s wait — worst case ~40 min before giving up, overridable
    via BENCH_PROBE_ATTEMPTS / BENCH_PROBE_WAIT_S."""
    import subprocess

    attempts = attempts or int(os.environ.get("BENCH_PROBE_ATTEMPTS", 5))
    wait_s = wait_s if wait_s is not None else int(
        os.environ.get("BENCH_PROBE_WAIT_S", 240))
    code = ("import jax, jax.numpy as jnp; "
            "print(float(jax.jit(lambda: jnp.sum(jnp.ones((8, 8))))()))")
    for attempt in range(attempts):
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  timeout=timeout_s, capture_output=True)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# tpu probe attempt {attempt + 1}/{attempts} failed",
              file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(wait_s)
    return False


def _roundtrip():
    import jax.numpy as jnp

    tiny = jnp.ones((1,), jnp.float32)
    for _ in range(3):
        float(jnp.sum(tiny + 1.0))
    t0 = time.time()
    for _ in range(5):
        float(jnp.sum(tiny + 1.0))
    return (time.time() - t0) / 5


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

    rt = _roundtrip()

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
    tq = 512 if N_QUERIES % 512 == 0 else None  # hardware-swept winner
    out = pallas_topk_jit(qb, corpus_pad, TOPK, 8, 2048, N_DOCS, tq=tq)  # warm
    # relay throughput varies run to run: take the best of 3 drain groups
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            out = pallas_topk_jit(qb, corpus_pad, TOPK, 8, 2048, N_DOCS, tq=tq)
        float(jnp.sum(out[0][0, 0]))  # drain queue
        elapsed = min(elapsed, (time.time() - t0 - rt) / ITERS)
    qps = N_QUERIES / elapsed
    flops = 2 * N_QUERIES * N_DOCS * DIM
    print(f"# tpu: {elapsed*1e3:.2f} ms / {N_QUERIES} queries "
          f"({flops/elapsed/1e12:.0f} TFLOP/s effective; compile {compile_s:.1f} s; "
          f"roundtrip {rt*1e3:.0f} ms) on {jax.devices()[0]}", file=sys.stderr)
    return qps


def bench_serve(queries: np.ndarray) -> float:
    """Packed-selection serving path (pallas_topk_serve) on the same 1M bf16
    corpus — the production query path (search_mode='serve')."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve

    corpus = jax.jit(
        lambda key: jax.random.normal(key, (N_DOCS, DIM), jnp.bfloat16)
    )(jax.random.key(0))
    qb = jax.device_put(jnp.asarray(queries, jnp.bfloat16))
    pad = (-N_DOCS) % 2048
    corpus_pad = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    rt = _roundtrip()
    tq = 512 if N_QUERIES % 512 == 0 else None
    out = pallas_topk_serve(qb, corpus_pad, TOPK, 4, 2048, N_DOCS, tq=tq)
    assert out[1].shape == (N_QUERIES, TOPK)
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            out = pallas_topk_serve(qb, corpus_pad, TOPK, 4, 2048, N_DOCS, tq=tq)
        float(jnp.sum(out[0][0, 0]))
        elapsed = min(elapsed, (time.time() - t0 - rt) / ITERS)
    print(f"# serve: {elapsed*1e3:.2f} ms / {N_QUERIES} queries", file=sys.stderr)
    return N_QUERIES / elapsed


# GMM components for the clustered 8.8M corpus (the workload coarse
# quantization exists for: the int8 exact kernel's throughput is
# data-independent, and the IVF bench needs cluster structure + an exact
# reference on the SAME corpus)
NCOMP_IVF = 4096
IVF_SIGMA = 0.5
_IVF_STATE: dict = {}
_I8Q_STATE: dict = {}
_I4Q_STATE: dict = {}
_PCAR_STATE: dict = {}

# small-batch serving latency (VERDICT r3 weak 4): p50 per-call wall time at
# these batch sizes, measured on the SAME 8.8M int8 corpus for the flat serve
# kernel and the learned-config IVF bulk kernel.  The legacy probe mode is
# NOT an arm at this scale: the fixed-capacity layout it runs on needs
# capacity_factor x corpus bytes (>= 13.6 GB at 8.8M int8) — out of HBM;
# see recipes/latency_probe.py for the 2M three-way comparison.
LAT_BATCHES = (1, 8, 64)
_LAT_STATE: dict = {}


def _p50_latency_ms(fn, rt: float | None = None, n: int = 20) -> float:
    """p50 per-call latency in ms with a per-call device sync (a serving
    request pays that sync).  The host<->device roundtrip is re-measured
    IMMEDIATELY before the timing loop (a stale ``rt`` from minutes earlier
    over- or under-corrects by whole milliseconds under relay variance —
    the r04 capture clamped real ~7 ms calls to 0.0 that way); the passed
    ``rt`` is ignored and kept only for call-site compatibility."""
    import jax

    fresh_rt = _roundtrip()
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.block_until_ready(fn())
        ts.append(time.time() - t0 - fresh_rt)
    return max(0.0, float(np.median(ts)) * 1e3)


def _make_centers():
    import jax
    import jax.numpy as jnp

    return jax.random.normal(jax.random.key(77), (NCOMP_IVF, DIM), jnp.float32)


GEN_GRANULE = 100_000


def _clustered_chunk(centers, start: int, rows: int):
    """Deterministic mixture rows [start, start+rows) — regenerable, so the
    flat build and the IVF two-pass build see IDENTICAL fp32 rows (and hence
    identical int8 quantization) without coexisting in HBM.  Rows are
    produced in fixed GEN_GRANULE blocks keyed by their own start, so ANY
    chunking of [0, N) yields the same row values; ``start`` must be granule-
    aligned (or >= 1e9: a free-standing query/sample block)."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    @_ft.partial(jax.jit, static_argnames=("rows",))
    def gen(key, centers, rows):
        k1, k2 = jax.random.split(key)
        a = jax.random.randint(k1, (rows,), 0, NCOMP_IVF)
        return centers[a] + IVF_SIGMA * jax.random.normal(
            k2, (rows, DIM), jnp.float32)

    if start >= 10**9:  # query/sample blocks need no cross-chunk consistency
        return gen(jax.random.fold_in(jax.random.key(5), start), centers,
                   rows=rows)
    assert start % GEN_GRANULE == 0, start
    parts = []
    off = start
    remaining = rows
    while remaining > 0:
        g = min(GEN_GRANULE, remaining)
        # always generate the FULL granule so values are chunking-invariant,
        # then slice (the tail granule costs one extra partial generation)
        full = gen(jax.random.fold_in(jax.random.key(5), off), centers,
                   rows=GEN_GRANULE)
        if g < GEN_GRANULE:
            part = full[:g]
            part.block_until_ready()
            full.delete()
        else:
            part = full
        parts.append(part)
        off += g
        remaining -= g
    if len(parts) == 1:
        return parts[0]
    out = jnp.concatenate(parts, axis=0)
    for p in parts:
        p.delete()
    return out


def bench_int8(queries: np.ndarray) -> float:
    """Exact-int8 top-100 over an N_DOCS_INT8-row corpus built + quantized on
    device (per-row absmax scales; in-kernel dequant).  The corpus is the
    clustered mixture so the IVF bench can reuse its exact reference; the
    exact kernel's throughput does not depend on the data distribution."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.quant import quantize_int8_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_scaled

    block = 2048
    n = N_DOCS_INT8 + ((-N_DOCS_INT8) % block)
    centers = _make_centers()

    # build the int8 corpus chunk-at-a-time: fp32 staging chunk -> quantize ->
    # donate-update into the preallocated int8 buffer (peak HBM = int8 corpus
    # + one staging chunk, never a full-precision copy)
    values = jnp.zeros((n, DIM), jnp.int8)
    scales = jnp.ones((n,), jnp.float32)

    def place(buf_v, buf_s, chunk_v, chunk_s, off):
        buf_v = jax.lax.dynamic_update_slice(buf_v, chunk_v, (off, 0))
        buf_s = jax.lax.dynamic_update_slice(buf_s, chunk_s, (off,))
        return buf_v, buf_s
    place = jax.jit(place, donate_argnums=(0, 1))

    off = 0
    while off < n:
        rows = min(INT8_CHUNK, n - off)
        chunk = _clustered_chunk(centers, off, rows)
        cv, cs = quantize_int8_device(chunk, block_rows=1024)
        chunk.delete()
        values, scales = place(values, scales, cv, cs, off)
        off += rows
    values.block_until_ready()

    # mixture queries (what IVF serves); the kernel doesn't care either way
    q_np = np.asarray(_clustered_chunk(centers, 10**9, 2048))
    _IVF_STATE["queries"] = q_np
    rt = _roundtrip()
    q = jax.device_put(jnp.asarray(q_np[:N_QUERIES_INT8], jnp.bfloat16))
    out = pallas_topk_serve_scaled(q, values, scales, TOPK, 4, block,
                                   N_DOCS_INT8, tq=N_QUERIES_INT8)
    assert out[1].shape == (N_QUERIES_INT8, TOPK)
    assert int(out[1].max()) < N_DOCS_INT8
    iters = 10
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = pallas_topk_serve_scaled(q, values, scales, TOPK, 4, block,
                                           N_DOCS_INT8, tq=N_QUERIES_INT8)
        float(jnp.sum(out[0][0, 0]))
        elapsed = min(elapsed, (time.time() - t0 - rt) / iters)
    qps = N_QUERIES_INT8 / elapsed
    print(f"# int8: {elapsed*1e3:.1f} ms / {N_QUERIES_INT8} queries over "
          f"{N_DOCS_INT8} docs", file=sys.stderr)
    # exact reference for the IVF recall measurement (serve selection at J=16
    # has measured recall ~1-5e-4 — negligible against an ~0.98 target)
    ref = pallas_topk_serve_scaled(q, values, scales, TOPK, 16, block,
                                   N_DOCS_INT8, tq=N_QUERIES_INT8)
    _IVF_STATE["ref_ids"] = np.asarray(ref[1])
    _IVF_STATE["exact_qps"] = qps

    # native-int8 MXU path (mode='approx'): int8 queries x int8 corpus in the
    # MXU's s8·s8→s32 mode — same corpus, measured against the serve number
    from denseretrievaltoolkits_tpu.ops.topk import (
        pallas_topk_serve_i8q, quantize_queries)
    qi, qs = quantize_queries(jnp.asarray(q_np[:N_QUERIES_INT8]))
    out = pallas_topk_serve_i8q(qi, values, scales, qs, TOPK, 4, block,
                                N_DOCS_INT8, tq=N_QUERIES_INT8)
    assert out[1].shape == (N_QUERIES_INT8, TOPK)
    elapsed_n = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = pallas_topk_serve_i8q(qi, values, scales, qs, TOPK, 4,
                                        block, N_DOCS_INT8, tq=N_QUERIES_INT8)
        float(jnp.sum(out[0][0, 0]))
        elapsed_n = min(elapsed_n, (time.time() - t0 - rt) / iters)
    ids_n = np.asarray(out[1])
    hits = sum(len(set(a) & set(b))
               for a, b in zip(ids_n, _IVF_STATE["ref_ids"]))
    _I8Q_STATE["qps"] = N_QUERIES_INT8 / elapsed_n
    _I8Q_STATE["recall"] = hits / (N_QUERIES_INT8 * TOPK)
    print(f"# int8 native-MXU: {elapsed_n*1e3:.1f} ms "
          f"({_I8Q_STATE['qps']/qps:.2f}x serve, "
          f"recall@{TOPK} {_I8Q_STATE['recall']:.4f})", file=sys.stderr)

    # small-batch serving latency, flat-serve arm (VERDICT r3 weak 4)
    for B_lat in LAT_BATCHES:
        pad = max(8, B_lat)  # kernel query tile floor
        qb = jax.device_put(jnp.asarray(q_np[:pad], jnp.bfloat16))

        def lat_fn(qb=qb, pad=pad):
            return pallas_topk_serve_scaled(qb, values, scales, TOPK, 4,
                                            block, N_DOCS_INT8, tq=pad)

        jax.block_until_ready(lat_fn())  # compile
        ms = _p50_latency_ms(lat_fn, rt)
        _LAT_STATE[f"flat_b{B_lat}"] = ms
        print(f"# int8 serve latency B={B_lat}: p50 {ms:.2f} ms",
              file=sys.stderr)

    # free ~6.8 GB HBM before the IVF/model benches
    values.delete(), scales.delete()
    return qps


def bench_ivf_int8(queries: np.ndarray) -> float:
    """Trained IVF (cell-major bulk kernel) on the same 8.8M clustered int8
    corpus: train + two-pass chunked build from the regenerated mixture, then
    bulk search at B=2048.  ``vs_baseline`` for this metric is the ratio to
    the exact-int8 serve QPS measured THIS run (the thing IVF must beat —
    VERDICT r2 next-round #1).  Stores recall@100 vs the exact reference in
    _IVF_STATE for the companion recall metric."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.index.ivf import IVFRaggedIndex
    from denseretrievaltoolkits_tpu.ops.ivf_bulk import ivf_ragged_search, serve_j

    centers = _make_centers()
    # ragged block-indirect layout: per-probe rows ~ N/nlist with ~3% block
    # padding and NO overflow slab (the fixed-capacity layout padded 60%+ or
    # spilled 20% of this corpus into the always-scanned slab at nlist=1024;
    # hardware-measured)
    nlist = int(os.environ.get("BENCH_IVF_NLIST", 256))
    nprobe = int(os.environ.get("BENCH_IVF_NPROBE", 8))
    idx = IVFRaggedIndex(DIM, nlist=nlist, nprobe=nprobe, dtype="int8",
                         block=int(os.environ.get("BENCH_IVF_BLOCK", 2048)))
    # best-RATIO point of the measured r3 curve (1.96x exact serve at recall
    # 0.93; BASELINE.md "Bulk IVF at 8.8M" table) — the companion recall
    # metric keeps the operating point honest.  At recall >= 0.98 (J=20)
    # this kernel measures 0.69x exact; see BASELINE.md for the full curve.
    idx.bulk_j = int(os.environ.get("BENCH_IVF_J", 8))
    idx.max_hot = int(os.environ.get("BENCH_IVF_MAXHOT", 16))
    t0 = time.time()
    tkey = f"ivf_train_v1_nlist{nlist}"
    cached = _cache_get(tkey)
    if cached is not None:
        idx.centroids = jnp.asarray(cached["centroids"])
    else:
        sample = _clustered_chunk(centers, 2 * 10**9, 262144)
        idx.train(sample, iters=8)
        sample.delete()
        _cache_put(tkey, centroids=np.asarray(idx.centroids, np.float32))
    jax.block_until_ready(idx.centroids)
    train_s = time.time() - t0
    akey = f"ivf_assign_v1_nlist{nlist}_n{N_DOCS_INT8}"
    acache = _cache_get(akey)
    t0 = time.time()
    idx.add_chunks(lambda s, r: _clustered_chunk(centers, s, r),
                   N_DOCS_INT8, chunk_rows=500_000,
                   assign=acache["assign"] if acache is not None else None)
    jax.block_until_ready(idx._values)
    if acache is None:
        _cache_put(akey, assign=idx.last_assign)
    build_s = time.time() - t0
    nb_total = int(idx._block_cell.shape[0])
    print(f"# ivf8.8M: train {train_s:.0f}s build {build_s:.0f}s "
          f"blocks={nb_total} nb_max={idx._nb_max} "
          f"pad={nb_total * idx.block / N_DOCS_INT8 - 1:.3f}", file=sys.stderr)

    B = 2048
    q_np = _IVF_STATE.get("queries")
    if q_np is None:
        q_np = np.asarray(_clustered_chunk(centers, 10**9, B))
    # tuning call: learns the hot-cell set + per-cell query capacity
    tv_np, doc_np = idx.search_bulk(q_np[:B], TOPK, nprobe=nprobe)
    state = idx._bulk_state
    print(f"# ivf8.8M: learned Qcap={state['qcap']} hot={state['hot'].size} "
          f"dropped={idx.last_dropped}", file=sys.stderr)
    # recall vs the flat corpus's exact reference (identical quantization —
    # the chunks regenerate bit-identically)
    ref = _IVF_STATE.get("ref_ids")
    if ref is not None:
        recall = float(np.mean([len(set(doc_np[i]) & set(ref[i])) / TOPK
                                for i in range(ref.shape[0])]))
    else:
        recall = float("nan")
    _IVF_STATE["recall"] = recall
    dropped = idx.last_dropped

    # steady-state timing: the jitted search with the learned configuration,
    # queue-drain pattern (per-call search_bulk syncs to host)
    q = jax.device_put(jnp.asarray(q_np[:B], jnp.float32))
    block = idx.block
    mean_rows = max(block, int(idx._n / max(1, nlist)))
    J = serve_j(TOPK, block, mean_rows)
    if getattr(idx, "bulk_j", None):
        J = min(idx.bulk_j, TOPK, block)
    sv, ss, si, side_valid = state["side"]
    hp = None
    if state["hot"].size:
        hp = jnp.zeros((nlist,), jnp.float32).at[
            jnp.asarray(state["hot"])].set(-jnp.inf)
    sb = idx.SIDE_BLOCK
    side_J = serve_j(TOPK, sb, max(sb, side_valid)) if side_valid else 4
    np_eff = min(nprobe, nlist - int(state["hot"].size))  # match search_bulk
    kw = dict(k=TOPK, nprobe=np_eff, Qcap=state["qcap"], J=J, block=block,
              nlist=nlist, nb_max=idx._nb_max, hot_penalty=hp,
              side_valid=side_valid, side_J=side_J, side_block=sb)

    def run():
        return ivf_ragged_search(q, idx.centroids, idx._values, idx._row_ids,
                                 idx._scales, idx._block_cell,
                                 idx._block_start, sv, ss, si, **kw)

    rt = _roundtrip()
    out = run()
    jax.block_until_ready(out[:2])
    out = run()  # absorb the second-dispatch relay stall (observed ~2 min)
    jax.block_until_ready(out[:2])
    iters = 10
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = run()
        float(jnp.sum(out[0][0, 0]))
        elapsed = min(elapsed, (time.time() - t0 - rt) / iters)
    qps = B / elapsed
    print(f"# ivf8.8M: {elapsed*1e3:.1f} ms / {B} queries, recall@100 "
          f"{recall:.4f}, dropped {dropped}", file=sys.stderr)

    # native-int8 variant of the same learned configuration: the cell/side
    # kernels run in the MXU's s8·s8→s32 mode with int8-quantized queries
    def run_n():
        return ivf_ragged_search(q, idx.centroids, idx._values, idx._row_ids,
                                 idx._scales, idx._block_cell,
                                 idx._block_start, sv, ss, si,
                                 i8_native=True, **kw)

    out = run_n()
    jax.block_until_ready(out[:2])
    elapsed_n = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = run_n()
        float(jnp.sum(out[0][0, 0]))
        elapsed_n = min(elapsed_n, (time.time() - t0 - rt) / iters)
    doc_n = np.asarray(out[1])
    if ref is not None:
        recall_n = float(np.mean([len(set(doc_n[i]) & set(ref[i])) / TOPK
                                  for i in range(ref.shape[0])]))
    else:
        recall_n = float("nan")
    _IVF_STATE["qps_native"] = B / elapsed_n
    _IVF_STATE["recall_native"] = recall_n
    print(f"# ivf8.8M native-MXU: {elapsed_n*1e3:.1f} ms "
          f"({elapsed/elapsed_n:.2f}x bulk, recall@100 {recall_n:.4f})",
          file=sys.stderr)

    # small-batch serving latency, IVF arm (VERDICT r3 weak 4): the PRODUCT
    # path (search_bulk) per batch size — each B learns its own Qcap (the
    # per-cell compute padding scales with B*nprobe/nlist, so reusing the
    # B=2048 capacity would overstate small-batch cost)
    for B_lat in LAT_BATCHES:
        idx._bulk_state = None
        qb_np = np.ascontiguousarray(q_np[:B_lat])
        idx.search_bulk(qb_np, TOPK, nprobe=nprobe)  # tune + compile

        def lat_fn(qb_np=qb_np):
            return idx.search_bulk(qb_np, TOPK, nprobe=nprobe)

        ms = _p50_latency_ms(lat_fn, rt)
        _LAT_STATE[f"ivf_b{B_lat}"] = ms
        print(f"# ivf8.8M latency B={B_lat}: p50 {ms:.2f} ms "
              f"(Qcap={idx._bulk_state['qcap']})", file=sys.stderr)

    for a in (idx._values, idx._scales, idx._row_ids, idx.centroids,
              idx._block_cell, idx._block_start):
        if a is not None:
            a.delete()
    return qps


def bench_int4_21m(queries: np.ndarray) -> float:
    """Exact-int4 top-100 over the 21M-row nibble-packed corpus on one chip
    (BASELINE config-5 scale; ~8 GB HBM)."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.quant import quantize_int4_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_sq4

    block = 2048
    n = N_DOCS_INT4 + ((-N_DOCS_INT4) % block)
    values = jnp.zeros((n, DIM // 2), jnp.int8)
    scales = jnp.ones((n,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(key, rows):
        return jax.random.normal(key, (rows, DIM), jnp.float32)

    def place(bv, bs, cv, cs, off):
        return (jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
                jax.lax.dynamic_update_slice(bs, cs, (off,)))
    place = jax.jit(place, donate_argnums=(0, 1))

    key = jax.random.key(2)
    off = 0
    while off < n:
        rows = min(500_000, n - off)
        key, sub = jax.random.split(key)
        cv, cs = quantize_int4_device(gen_chunk(sub, rows=rows),
                                      block_rows=1024)
        values, scales = place(values, scales, cv, cs, off)
        off += rows
    values.block_until_ready()

    rt = _roundtrip()
    q = jax.device_put(jnp.asarray(queries[:N_QUERIES_INT8], jnp.bfloat16))
    out = pallas_topk_serve_sq4(q, values, scales, TOPK, 4, block,
                                N_DOCS_INT4, tq=N_QUERIES_INT8)
    assert out[1].shape == (N_QUERIES_INT8, TOPK)
    assert int(out[1].max()) < N_DOCS_INT4
    iters = 5
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = pallas_topk_serve_sq4(q, values, scales, TOPK, 4, block,
                                        N_DOCS_INT4, tq=N_QUERIES_INT8)
        float(jnp.sum(out[0][0, 0]))
        elapsed = min(elapsed, (time.time() - t0 - rt) / iters)
    qps = N_QUERIES_INT8 / elapsed
    print(f"# int4 21M: {elapsed*1e3:.1f} ms / {N_QUERIES_INT8} queries",
          file=sys.stderr)

    # native-int8 variant: int8 queries, nibbles sign-extend to int8, both
    # half-dim matmuls in the MXU's s8·s8→s32 mode (mode='approx' on int4
    # indexes); recall vs the bf16-query serve ranking on the same corpus
    from denseretrievaltoolkits_tpu.ops.topk import (
        pallas_topk_serve_sq4_i8q, quantize_queries)
    ref_ids = np.asarray(out[1])
    qi, qs = quantize_queries(jnp.asarray(queries[:N_QUERIES_INT8],
                                          jnp.float32))
    out = pallas_topk_serve_sq4_i8q(qi, values, scales, qs, TOPK, 4, block,
                                    N_DOCS_INT4, tq=N_QUERIES_INT8)
    jax.block_until_ready(out)
    elapsed_n = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = pallas_topk_serve_sq4_i8q(qi, values, scales, qs, TOPK, 4,
                                            block, N_DOCS_INT4,
                                            tq=N_QUERIES_INT8)
        float(jnp.sum(out[0][0, 0]))
        elapsed_n = min(elapsed_n, (time.time() - t0 - rt) / iters)
    ids_n = np.asarray(out[1])
    hits = sum(len(set(a) & set(b)) for a, b in zip(ids_n, ref_ids))
    _I4Q_STATE["qps"] = N_QUERIES_INT8 / elapsed_n
    _I4Q_STATE["recall"] = hits / (N_QUERIES_INT8 * TOPK)
    print(f"# int4 21M native-MXU: {elapsed_n*1e3:.1f} ms "
          f"({elapsed/elapsed_n:.2f}x serve, recall@{TOPK} "
          f"{_I4Q_STATE['recall']:.4f})", file=sys.stderr)
    values.delete(), scales.delete()
    return qps


_SPEC_STATE: dict = {}


def _spec_reference() -> dict:
    """Shared exact-int8 reference over the SPECTRUMED 8.8M mixture — ranking
    ids + serve-qps denominator for the PCAR and PQ ladders.  r4 built this
    corpus twice (once in each arm); now it is computed once per process and
    memoized: {"q_np": [2048, 768] fp32, "ref_ids": [2048, TOPK] int,
    "int8_qps": float}."""
    if _SPEC_STATE:
        return _SPEC_STATE
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.quant import quantize_int8_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_scaled

    block = 2048
    nq = N_QUERIES
    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    n = N_DOCS_INT8 + ((-N_DOCS_INT8) % block)

    def place_fn(bv, bs, cv, cs, off):
        return (jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
                jax.lax.dynamic_update_slice(bs, cs, (off,)))
    place = jax.jit(place_fn, donate_argnums=(0, 1))

    values = jnp.zeros((n, DIM), jnp.int8)
    scales = jnp.ones((n,), jnp.float32)
    off = 0
    while off < n:
        rows = min(INT8_CHUNK, n - off)
        chunk = _clustered_chunk(centers, off, rows) * lam[None, :]
        cv, cs = quantize_int8_device(chunk, block_rows=1024)
        chunk.delete()
        values, scales = place(values, scales, cv, cs, off)
        off += rows
    values.block_until_ready()
    q_np = (np.asarray(_clustered_chunk(centers, 10**9, nq), np.float32)
            * np.asarray(lam)[None, :])
    q = jax.device_put(jnp.asarray(q_np, jnp.bfloat16))
    rt = _roundtrip()
    ref = pallas_topk_serve_scaled(q, values, scales, TOPK, 16, block,
                                   N_DOCS_INT8, tq=512)
    ref_ids = np.asarray(ref[1])
    el8 = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            out = pallas_topk_serve_scaled(q, values, scales, TOPK, 4, block,
                                           N_DOCS_INT8, tq=512)
        float(jnp.sum(out[0][0, 0]))
        el8 = min(el8, (time.time() - t0 - rt) / 5)
    values.delete(), scales.delete()
    _SPEC_STATE.update(q_np=q_np, ref_ids=ref_ids, int8_qps=nq / el8)
    print(f"# spectrumed exact-int8 serve reference: {nq / el8:.0f} qps",
          file=sys.stderr)
    return _SPEC_STATE


def _pq_sample() -> np.ndarray:
    """262k spectrumed training sample (host fp32), memoized per process —
    shared by the PCA/OPQ/PQ/IVF-PQ training paths."""
    if "sample" not in _SPEC_STATE:
        lam = ((np.arange(DIM) + 1.0) ** -0.35).astype(np.float32)
        centers = _make_centers()
        _SPEC_STATE["sample"] = (
            np.asarray(_clustered_chunk(centers, 2 * 10**9, 262_144),
                       np.float32) * lam[None, :])
    return _SPEC_STATE["sample"]


def _opq_rotation(M: int, nbits: int) -> np.ndarray:
    """Trained OPQ rotation for (M, nbits) on the shared spectrumed sample,
    disk-cached (the Procrustes alternation costs 120-150 s on this host)."""
    key = f"opq_{M}x{nbits}_v1"
    cached = _cache_get(key)
    if cached is not None:
        return cached["rot"]
    from denseretrievaltoolkits_tpu.index.transforms import OPQTransform

    opq = OPQTransform(DIM, M=M, nbits=nbits)
    t0 = time.time()
    opq.train(_pq_sample())
    print(f"# opq{M}x{nbits} train: {time.time() - t0:.0f}s", file=sys.stderr)
    _cache_put(key, rot=np.asarray(opq.matrix, np.float32))
    return opq.matrix


def bench_pcar_sq4() -> float:
    """PCAR384,SQ4 at 8.8M: the trained-factory compression ladder's
    2-bits-per-original-dim point (reference analog: arbitrary
    ``faiss.index_factory`` strings, DRT/evaluator/index.py:47-54).

    Data is the clustered mixture with a power-law column spectrum
    ``lambda_j=(j+1)^-0.35`` — isotropic gaussians have no principal
    subspace, so a spectrum is what makes the PCA rotation meaningful.
    QUERIES are drawn from the same mixture (fresh block, offset 1e9), like
    real query embeddings sharing the corpus spectrum — with ISOTROPIC
    queries the discarded 384 dims contribute relatively more to rankings
    and recall@100 drops 0.81 -> 0.65 (measured; recorded in BASELINE.md as
    the ladder's query-distribution sensitivity).
    Reference ranking AND the qps denominator are exact-int8 serve over the
    original 768-dim spectrumed rows, measured in-session; the int8 corpus
    is deleted before the transformed sq4 corpus is built (peak HBM ~7 GB).
    Returns the PCAR serve qps; companions land in ``_PCAR_STATE``."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.index.transforms import PCATransform
    from denseretrievaltoolkits_tpu.ops.quant import (quantize_int4_device,
                                                      quantize_int8_device)
    from denseretrievaltoolkits_tpu.ops.topk import (pallas_topk_serve_scaled,
                                                     pallas_topk_serve_sq4,
                                                     pallas_topk_serve_sq4_i8q,
                                                     quantize_queries)

    block, dout = 2048, 384
    nq = N_QUERIES
    tq = 512
    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    n = N_DOCS_INT8 + ((-N_DOCS_INT8) % block)

    def place_fn(bv, bs, cv, cs, off):
        return (jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
                jax.lax.dynamic_update_slice(bs, cs, (off,)))
    place = jax.jit(place_fn, donate_argnums=(0, 1))

    # 1) shared spectrumed int8 reference (built once per process)
    spec = _spec_reference()
    q_np, ref_ids = spec["q_np"], spec["ref_ids"]
    _PCAR_STATE["int8_qps"] = spec["int8_qps"]

    # 2) PCA rotation trained on a 262k sample (host SVD; disk-cached — a
    # deterministic function of the fixed sample seed)
    cached = _cache_get("pca384_v1")
    if cached is not None:
        W_np = cached["matrix"]
    else:
        sample = _pq_sample()
        pca = PCATransform(DIM, dout, rotate=True)
        pca.train(sample)
        kept = float(np.sum(np.var(sample @ pca.matrix, axis=0))
                     / np.sum(np.var(sample, axis=0)))
        print(f"# pcar pca kept variance {kept:.4f}", file=sys.stderr)
        W_np = pca.matrix
        _cache_put("pca384_v1", matrix=W_np)
    W = jnp.asarray(W_np)

    # 3) transformed nibble-packed corpus (1.7 GB) + serve / i8q timing
    v4 = jnp.zeros((n, dout // 2), jnp.int8)
    s4 = jnp.ones((n,), jnp.float32)
    off = 0
    while off < n:
        rows = min(INT8_CHUNK, n - off)
        chunk = _clustered_chunk(centers, off, rows) * lam[None, :]
        t = jnp.dot(chunk, W, preferred_element_type=jnp.float32)
        chunk.delete()
        cv, cs = quantize_int4_device(t, block_rows=1024)
        t.delete()
        v4, s4 = place(v4, s4, cv, cs, off)
        off += rows
    v4.block_until_ready()

    qt_f = jnp.dot(jnp.asarray(q_np, jnp.float32), W,
                   preferred_element_type=jnp.float32)
    qt = qt_f.astype(jnp.bfloat16)
    rt = _roundtrip()
    out = pallas_topk_serve_sq4(qt, v4, s4, TOPK, 4, block, N_DOCS_INT8,
                                tq=tq)
    el = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            out = pallas_topk_serve_sq4(qt, v4, s4, TOPK, 4, block,
                                        N_DOCS_INT8, tq=tq)
        float(jnp.sum(out[0][0, 0]))
        el = min(el, (time.time() - t0 - rt) / 5)
    ids = np.asarray(out[1])
    _PCAR_STATE["recall"] = float(np.mean(
        [len(set(a) & set(b)) / TOPK for a, b in zip(ids, ref_ids)]))
    qps = nq / el
    print(f"# pcar384,sq4 serve: {qps:.0f} qps "
          f"({qps / _PCAR_STATE['int8_qps']:.2f}x int8-serve) recall@{TOPK} "
          f"{_PCAR_STATE['recall']:.4f}", file=sys.stderr)

    qi, qs = quantize_queries(qt_f)
    out = pallas_topk_serve_sq4_i8q(qi, v4, s4, qs, TOPK, 4, block,
                                    N_DOCS_INT8, tq=tq)
    eln = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            out = pallas_topk_serve_sq4_i8q(qi, v4, s4, qs, TOPK, 4, block,
                                            N_DOCS_INT8, tq=tq)
        float(jnp.sum(out[0][0, 0]))
        eln = min(eln, (time.time() - t0 - rt) / 5)
    ids = np.asarray(out[1])
    _PCAR_STATE["qps_i8q"] = nq / eln
    _PCAR_STATE["recall_i8q"] = float(np.mean(
        [len(set(a) & set(b)) / TOPK for a, b in zip(ids, ref_ids)]))
    print(f"# pcar384,sq4 i8q: {nq / eln:.0f} qps recall@{TOPK} "
          f"{_PCAR_STATE['recall_i8q']:.4f}", file=sys.stderr)
    v4.delete(), s4.delete()
    return qps


_PQ_STATE = {}


def _pq_arm(m_sub: int, nbits: int, block: int, rot=None,
            time_it: bool = True, cb_key: str | None = None):
    """Train(or load)+encode+serve ONE flat-PQ configuration on the 8.8M
    spectrumed mixture; returns (qps|None, recall10@TOPK vs the shared
    exact-int8 reference).  Arm configs are the hardware-swept serving
    defaults (index/pq.py): 8-bit = s8-MXU decode at block 1024; 4-bit =
    bf16 decode at block 2048."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.ops.pq import (build_bdcb, build_bdcb_i8,
                                                   pallas_topk_pq,
                                                   pq_encode_device, pq_train)

    spec = _spec_reference()
    ref10 = spec["ref_ids"][:, :10]
    q_f = jnp.asarray(spec["q_np"], jnp.float32)
    nq = N_QUERIES
    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    n = N_DOCS_INT8 + ((-N_DOCS_INT8) % 2048)  # divisible by every block

    kq = 1 << nbits
    cached = _cache_get(cb_key) if cb_key else None
    if cached is not None:
        cb = cached["cb"]
    else:
        sample = _pq_sample()
        smp = sample @ rot if rot is not None else sample
        cb = pq_train(smp, m_sub, iters=8, k=kq)
        if cb_key:
            _cache_put(cb_key, cb=np.asarray(cb, np.float32))
    cb_dev = jnp.asarray(cb)
    if nbits == 8:
        bd8, sc = build_bdcb_i8(cb)
        bdcb, scale = jnp.asarray(bd8), jnp.asarray(sc)
    else:
        bdcb, scale = jnp.asarray(build_bdcb(cb)), None
    rows = m_sub // 2 if nbits == 4 else m_sub
    rot_dev = jnp.asarray(rot) if rot is not None else None

    def place_fn(buf, chunk, off):
        return jax.lax.dynamic_update_slice(buf, chunk, (0, off))
    place_codes = jax.jit(place_fn, donate_argnums=(0,))

    codes = jnp.zeros((rows, n), jnp.int8)
    o = 0
    t0 = time.time()
    while o < n:
        r = min(INT8_CHUNK, n - o)
        chunk = _clustered_chunk(centers, o, r) * lam[None, :]
        if rot_dev is not None:
            rc = jnp.dot(chunk, rot_dev, preferred_element_type=jnp.float32)
            chunk.delete()
            chunk = rc
        cc = pq_encode_device(chunk, cb_dev)
        chunk.delete()
        codes = place_codes(codes, cc, o)
        o += r
    codes.block_until_ready()
    _PQ_STATE["encode_s"] = time.time() - t0
    n_blocks = n // block
    lam_j = TOPK / n_blocks
    J = max(4, int(np.ceil(lam_j + 4.0 * np.sqrt(lam_j) + 4.0)))
    qq = (jnp.dot(q_f, rot_dev, preferred_element_type=jnp.float32)
          if rot_dev is not None else q_f)
    rt = _roundtrip()
    out = pallas_topk_pq(qq, codes, bdcb, TOPK, J, block, N_DOCS_INT8,
                         tq=512, nbits=nbits, scale=scale)
    qps_arm = None
    if time_it:
        el = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                out = pallas_topk_pq(qq, codes, bdcb, TOPK, J, block,
                                     N_DOCS_INT8, tq=512, nbits=nbits,
                                     scale=scale)
            float(jnp.sum(out[0][0, 0]))
            el = min(el, (time.time() - t0 - rt) / 3)
        qps_arm = nq / el
    ids = np.asarray(out[1])
    rec = float(np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(ids, ref10)]))
    codes.delete()
    return qps_arm, rec


def bench_ivfpq(rot=None, tag: str = "ivfpq192x4") -> float:
    """IVF{n},PQ192x4 (optionally OPQ-chained: ``rot`` is applied to the
    training sample, every corpus chunk, and the queries — the canonical
    FAISS composition ``OPQ192x4,IVF{n},PQ192x4``; VERDICT r4 #3) on the
    SAME spectrumed corpus/reference — residual encoding (FAISS IVFPQ
    by_residual defaults), probe-pruned decode-and-scan (index/ivf_pq.py).
    Rotation is orthogonal, so recall vs the unrotated exact reference is
    exact.  Trained state (coarse centroids + codebooks) and the corpus
    assignment vector are disk-cached per tag."""
    import jax
    import jax.numpy as jnp

    from denseretrievaltoolkits_tpu.index.ivf_pq import IVFPQIndex

    spec = _spec_reference()
    ref10 = spec["ref_ids"][:, :10]
    q_np = spec["q_np"]
    nq = N_QUERIES
    lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
    centers = _make_centers()
    rot_dev = jnp.asarray(rot, jnp.float32) if rot is not None else None

    nlist = int(os.environ.get("BENCH_IVFPQ_NLIST", 256))
    # nprobe=nlist/32: the measured qps-recall sweet spot (r5 sweep,
    # recipes/ivfpq_sweep.py — 8,300 qps @ 0.731 at 8.8M, dominating flat
    # OPQ on both axes; 32 probes HALVED qps for +0.035 recall)
    nprobe = int(os.environ.get("BENCH_IVFPQ_NPROBE", max(1, nlist // 32)))
    idx = IVFPQIndex(DIM, nlist=nlist, nprobe=nprobe, M=192, nbits=4,
                     block=2048)
    idx.bulk_j = int(os.environ.get("BENCH_IVFPQ_J", 8))
    idx.max_hot = int(os.environ.get("BENCH_IVFPQ_MAXHOT", 16))
    tkey = f"{tag}_train_v1_nlist{nlist}"
    akey = f"{tag}_assign_v1_nlist{nlist}_n{N_DOCS_INT8}"
    cached = _cache_get(tkey)
    t0 = time.time()
    if cached is not None:
        idx.centroids = jnp.asarray(cached["centroids"])
        idx.codebooks = cached["codebooks"]
        idx._set_codebooks()
    else:
        sample = _pq_sample()
        idx.train(sample @ rot if rot is not None else sample, iters=8)
        _cache_put(tkey, centroids=np.asarray(idx.centroids, np.float32),
                   codebooks=np.asarray(idx.codebooks, np.float32))
    train_s = time.time() - t0

    def spec_chunk(s, r):
        c = _clustered_chunk(centers, s, r)
        out = c * lam[None, :]
        c.delete()
        if rot_dev is not None:
            out2 = jnp.dot(out, rot_dev, preferred_element_type=jnp.float32)
            out.delete()
            out = out2
        return out

    acache = _cache_get(akey)
    t0 = time.time()
    idx.add_chunks(spec_chunk, N_DOCS_INT8, chunk_rows=500_000,
                   assign=acache["assign"] if acache is not None else None)
    jax.block_until_ready(idx._values)
    if acache is None:
        _cache_put(akey, assign=idx.last_assign)
    print(f"# {tag}: train {train_s:.0f}s build {time.time()-t0:.0f}s "
          f"blocks={int(idx._block_cell.shape[0])}", file=sys.stderr)

    # tuning call learns Qcap + hot set; its host result scores recall
    q_rot_np = (np.asarray(q_np @ rot, np.float32) if rot is not None
                else np.asarray(q_np, np.float32))
    _, doc_np = idx.search_bulk(q_rot_np, TOPK, nprobe=nprobe)
    rec_ivf = float(np.mean(
        [len(set(a) & set(b)) / 10 for a, b in zip(doc_np, ref10)]))
    st = idx._bulk_state
    print(f"# {tag}: Qcap={st['qcap']} hot={st['hot'].size} "
          f"dropped={idx.last_dropped}", file=sys.stderr)
    q_dev = jnp.asarray(q_rot_np, jnp.float32)
    rt = _roundtrip()
    el = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(3):
            tv, doc = idx.search_bulk_async(q_dev, TOPK, nprobe=nprobe)
        float(jnp.sum(tv[0]))
        el = min(el, (time.time() - t0 - rt) / 3)
    qps = nq / el
    _PQ_STATE[f"qps_{tag}"] = qps
    _PQ_STATE[f"recall_{tag}"] = rec_ivf
    print(f"# {tag} serve: {qps:.0f} qps "
          f"({qps / spec['int8_qps']:.2f}x int8-serve) "
          f"recall10@{TOPK} {rec_ivf:.4f}", file=sys.stderr)
    sv, ss, si, _ = st["side"]
    for a in (idx._values, idx._row_ids, idx.centroids, idx._block_cell,
              idx._block_start, sv, ss, si):
        if a is not None and hasattr(a, "delete"):
            a.delete()
    return qps


def bench_pq_family(on_row=None) -> None:
    """Flat-PQ / OPQ / IVF-PQ ladder at 8.8M on the spectrumed mixture
    (reference analog: trained ``faiss.index_factory`` strings,
    DRT/evaluator/index.py:47-54).  Sub-arms run in VALUE order, each gated
    on the remaining wall budget (VERDICT r4 #1) and each checkpointed via
    ``on_row`` the moment it lands:

      opq192x4    — the 4-bit flagship (96 B/row, best qps@recall)
      ivfpq_opq   — OPQ192x4,IVF{n},PQ192x4 chain (VERDICT r4 #3: the
                    rotation bought flat PQ +0.45 recall10; measure it on
                    the composition)
      ivfpq192x4  — un-rotated IVF{n},PQ192x4 (r4 regression anchor)
      pq96        — the plain 8-bit rung
      opq96       — what the rotation buys the 8-bit rung (recall only)

    Recall contract: candidate-window (top-10 of the exact int8 reference
    inside the arm's top-100 — the rerank contract; FAISS reports PQ the
    same way).  qps denominator = the shared spectrumed exact-int8 serve
    (_spec_reference) measured this session."""
    spec_est = 0 if _SPEC_STATE.get("ref_ids") is not None else 220
    if not _gate("pq:spec_reference", spec_est + 120):
        return
    spec = _spec_reference()
    _PQ_STATE["int8_qps"] = spec["int8_qps"]
    if on_row:
        on_row(f"pq_ref_int8_qps_{N_DOCS_INT8 // 1000}k",
               round(spec["int8_qps"], 1), "qps", None)

    def sub(name, est_cold, est_warm, warm_keys, fn):
        warm = all(_cache_get(k) is not None for k in warm_keys)
        if not _gate(name, est_warm if warm else est_cold):
            return
        try:
            fn()
        except Exception as exc:
            print(f"# pq sub-arm {name} failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    def run_opq4():
        rot = _opq_rotation(192, 4)
        qps, rec = _pq_arm(192, 4, 2048, rot=rot, cb_key="pqcb_opq192x4_v1")
        _PQ_STATE["qps_x4"], _PQ_STATE["recall_x4"] = qps, rec
        print(f"# opq192x4 serve: {qps:.0f} qps "
              f"({qps / spec['int8_qps']:.2f}x int8-serve) recall10@{TOPK} "
              f"{rec:.4f}", file=sys.stderr)
        if on_row:
            on_row(f"opq192x4_qps_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                   round(qps, 1), "qps", round(qps / spec["int8_qps"], 2))
            on_row(f"opq192x4_recall10in{TOPK}_{N_DOCS_INT8 // 1000}k",
                   round(rec, 4), "recall", round(rec / 0.76, 3))

    def run_ivfpq_opq():
        rot = _opq_rotation(192, 4)
        bench_ivfpq(rot=rot, tag="ivfpq_opq192x4")
        if on_row:
            on_row(f"ivfpq_opq192x4_qps_{N_DOCS_INT8 // 1000}k_docs"
                   f"_top{TOPK}",
                   round(_PQ_STATE["qps_ivfpq_opq192x4"], 1), "qps",
                   round(_PQ_STATE["qps_ivfpq_opq192x4"]
                         / spec["int8_qps"], 2))
            on_row(f"ivfpq_opq192x4_recall10in{TOPK}_{N_DOCS_INT8 // 1000}k",
                   round(_PQ_STATE["recall_ivfpq_opq192x4"], 4), "recall",
                   round(_PQ_STATE["recall_ivfpq_opq192x4"] / 0.76, 3))

    def run_ivfpq_plain():
        bench_ivfpq(tag="ivfpq192x4")
        if on_row:
            on_row(f"ivfpq192x4_qps_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                   round(_PQ_STATE["qps_ivfpq192x4"], 1), "qps",
                   round(_PQ_STATE["qps_ivfpq192x4"] / spec["int8_qps"], 2))
            on_row(f"ivfpq192x4_recall10in{TOPK}_{N_DOCS_INT8 // 1000}k",
                   round(_PQ_STATE["recall_ivfpq192x4"], 4), "recall",
                   round(_PQ_STATE["recall_ivfpq192x4"] / 0.76, 3))

    def run_pq96():
        qps, rec = _pq_arm(96, 8, 1024, cb_key="pqcb_pq96x8_v1")
        _PQ_STATE["recall"] = rec
        print(f"# pq96 serve(i8dec): {qps:.0f} qps "
              f"({qps / spec['int8_qps']:.2f}x int8-serve) recall10@{TOPK} "
              f"{rec:.4f}", file=sys.stderr)
        if on_row:
            on_row(f"pq96_qps_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                   round(qps, 1), "qps", round(qps / spec["int8_qps"], 2))
            on_row(f"pq96_recall10in{TOPK}_{N_DOCS_INT8 // 1000}k",
                   round(rec, 4), "recall", round(rec / 0.31, 3))

    def run_opq96():
        rot = _opq_rotation(96, 8)
        _, rec = _pq_arm(96, 8, 1024, rot=rot, time_it=False,
                         cb_key="pqcb_opq96x8_v1")
        _PQ_STATE["recall_opq"] = rec
        print(f"# opq96 recall10@{TOPK}: {rec:.4f}", file=sys.stderr)
        if on_row:
            on_row(f"opq96_recall10in{TOPK}_{N_DOCS_INT8 // 1000}k",
                   round(rec, 4), "recall", round(rec / 0.76, 3))

    sub("pq:opq192x4", 420, 220, ("opq_192x4_v1", "pqcb_opq192x4_v1"),
        run_opq4)
    sub("pq:ivfpq_opq192x4", 480, 300,
        ("opq_192x4_v1", "ivfpq_opq192x4_train_v1_nlist256",
         f"ivfpq_opq192x4_assign_v1_nlist256_n{N_DOCS_INT8}"), run_ivfpq_opq)
    sub("pq:ivfpq192x4", 420, 280,
        ("ivfpq192x4_train_v1_nlist256",
         f"ivfpq192x4_assign_v1_nlist256_n{N_DOCS_INT8}"), run_ivfpq_plain)
    sub("pq:pq96", 260, 200, ("pqcb_pq96x8_v1",), run_pq96)
    sub("pq:opq96", 360, 180, ("opq_96x8_v1", "pqcb_opq96x8_v1"), run_opq96)


def _bert_base_model(attention: str = "xla"):
    import jax

    from denseretrievaltoolkits_tpu.models.bert import BertConfig
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

    config = BertConfig()  # bert-base shape
    model = DRModel(DRModelSpec(bert_config=config, dtype="bfloat16",
                                attention=attention))
    params = model.init_params(jax.random.key(0))
    return config, model, params


def _token_batch(rng, n, seq, vocab):
    return {
        "input_ids": rng.integers(1, vocab, size=(n, seq)).astype(np.int32),
        "attention_mask": np.ones((n, seq), np.int32),
    }


def bench_train_step() -> float:
    """bert-base dual-encoder adamw step (32 queries / 64 passages x156 tok,
    bf16) — round-1 conditions (BASELINE.md train-step row). Returns ms/step
    including the per-step dispatch share (queue-drain timing)."""
    import tempfile

    from denseretrievaltoolkits_tpu.config import TrainingArguments
    from denseretrievaltoolkits_tpu.train.trainer import Trainer

    config, model, params = _bert_base_model()
    tmp = tempfile.mkdtemp()
    args = TrainingArguments(output_dir=tmp, cache_train_dir=tmp,
                             learning_rate=1e-5, optimizer="adamw", log_every=0)
    trainer = Trainer(args, model, params)
    rng = np.random.default_rng(0)
    batch = (_token_batch(rng, 32, 156, config.vocab_size),
             _token_batch(rng, 64, 156, config.vocab_size))
    loss = trainer.train_step(batch)  # compile
    assert np.isfinite(float(loss))
    rt = _roundtrip()
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        loss = trainer.train_step(batch)
    float(loss)
    ms = (time.time() - t0 - rt) / iters * 1e3
    print(f"# train step: {ms:.1f} ms", file=sys.stderr)
    return ms


def bench_encode() -> float:
    """bert-base corpus encode throughput (batch 256, seq 156, bf16) —
    round-1 conditions (BASELINE.md encode row)."""
    import jax
    import jax.numpy as jnp

    config, model, params = _bert_base_model()
    encode = jax.jit(model.encode_passage)
    rng = np.random.default_rng(0)
    batch = _token_batch(rng, 256, 156, config.vocab_size)
    reps = encode(params, batch)  # compile
    reps.block_until_ready()
    rt = _roundtrip()
    iters = 20
    per_batch = float("inf")  # best-of-3: a relay stall inside one timing
    for _ in range(3):        # loop tanked the r04 row 5.7x (459 vs 2635)
        t0 = time.time()
        for _ in range(iters):
            reps = encode(params, batch)
        float(jnp.sum(reps[0, 0]))
        per_batch = min(per_batch, (time.time() - t0 - rt) / iters)
    pps = 256 / per_batch
    print(f"# encode: {pps:.0f} passages/s", file=sys.stderr)
    return pps


def bench_encode_fused() -> float:
    """Same conditions as bench_encode but attention='fused' (ops/attn.py):
    the seq-160-native single-block kernel (VERDICT r4 #5) vs the xla row."""
    import jax
    import jax.numpy as jnp

    config, model, params = _bert_base_model(attention="fused")
    encode = jax.jit(model.encode_passage)
    rng = np.random.default_rng(0)
    batch = _token_batch(rng, 256, 156, config.vocab_size)
    reps = encode(params, batch)
    reps.block_until_ready()
    rt = _roundtrip()
    iters = 20
    per_batch = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            reps = encode(params, batch)
        float(jnp.sum(reps[0, 0]))
        per_batch = min(per_batch, (time.time() - t0 - rt) / iters)
    pps = 256 / per_batch
    print(f"# encode fused-attn: {pps:.0f} passages/s", file=sys.stderr)
    return pps


_VARLEN_STATE: dict = {}


def bench_encode_varlen() -> float:
    """bert-base encode over a realistic VARIABLE-length corpus: bucketed
    pipeline (length-sorted iteration + per-batch bucket padding,
    data/collators.bucket_length, step 32) vs always-padding to p_max=156.

    Lengths ~ lognormal (median ~70 tokens, MS MARCO-passage-like), clipped
    to [16, 156], fixed seed. Both arms encode the SAME 16,384 passages in
    64 batches of 256 with per-batch host->device transfer (part of the real
    pipeline; bucketing legitimately shrinks it too). Returns bucketed
    passages/s; the fixed-pad arm lands in _VARLEN_STATE for the
    same-session ratio. This is the TPU answer to the reference's
    per-batch dynamic padding (tokenizer.pad)."""
    import jax

    from denseretrievaltoolkits_tpu.data.collators import pad_batch

    config, model, params = _bert_base_model()
    encode = jax.jit(model.encode_passage)
    rng = np.random.default_rng(0)
    N, B, MAXL = 16384, 256, 156
    lens = np.clip(np.exp(rng.normal(4.25, 0.55, N)), 16, MAXL).astype(int)
    seqs = [rng.integers(1, config.vocab_size, L).tolist() for L in lens]

    fixed = [pad_batch(seqs[i:i + B], MAXL, 0) for i in range(0, N, B)]
    order = np.argsort(lens, kind="stable")
    sseqs = [seqs[i] for i in order]
    bucketed = [pad_batch(sseqs[i:i + B], MAXL, 0, bucket_step=32)
                for i in range(0, N, B)]

    def run(batches):
        seen = set()
        for b in batches:  # compile each distinct bucket once, off the clock
            shape = b["input_ids"].shape
            if shape not in seen:
                seen.add(shape)
                encode(params, b).block_until_ready()
        # best-of-3: the r04 capture read 1.01x because a relay stall landed
        # inside the bucketed arm's SINGLE timing pass (the instrumented
        # re-run, recipes/varlen_probe.py, reproduced 1.91x on 3/3 trials)
        best = float("inf")
        for _ in range(3):
            rt = _roundtrip()
            t0 = time.time()
            outs = [encode(params, b) for b in batches]
            jax.block_until_ready(outs)
            best = min(best, time.time() - t0 - rt)
        return N / best

    pps_fixed = run(fixed)
    pps_bucketed = run(bucketed)
    _VARLEN_STATE["fixed"] = pps_fixed
    widths = sorted({b["input_ids"].shape[1] for b in bucketed})
    print(f"# varlen encode: fixed {pps_fixed:.0f} p/s, bucketed "
          f"{pps_bucketed:.0f} p/s ({pps_bucketed / pps_fixed:.2f}x), "
          f"buckets {widths}", file=sys.stderr)
    return pps_bucketed


def bench_encode_varlen_fused() -> float:
    """The production encode configuration: bucketed variable-length batches
    AND attention='fused' (both Pallas encoder kernels).  Same corpus/seed
    as bench_encode_varlen; vs_baseline is wired to that arm's fixed-pad
    measurement from THIS session (so the row reads 'bucketed+fused over
    always-pad-156 xla' — the README/BASELINE 2.54x claim)."""
    import jax

    from denseretrievaltoolkits_tpu.data.collators import pad_batch

    config, model, params = _bert_base_model(attention="fused")
    encode = jax.jit(model.encode_passage)
    rng = np.random.default_rng(0)
    N, B, MAXL = 16384, 256, 156
    lens = np.clip(np.exp(rng.normal(4.25, 0.55, N)), 16, MAXL).astype(int)
    seqs = [rng.integers(1, config.vocab_size, L).tolist() for L in lens]
    order = np.argsort(lens, kind="stable")
    sseqs = [seqs[i] for i in order]
    bucketed = [pad_batch(sseqs[i:i + B], MAXL, 0, bucket_step=32)
                for i in range(0, N, B)]
    seen = set()
    for b in bucketed:
        shape = b["input_ids"].shape
        if shape not in seen:
            seen.add(shape)
            encode(params, b).block_until_ready()
    best = float("inf")
    for _ in range(3):
        rt = _roundtrip()
        t0 = time.time()
        outs = [encode(params, b) for b in bucketed]
        jax.block_until_ready(outs)
        best = min(best, time.time() - t0 - rt)
    pps = N / best
    print(f"# varlen encode bucketed+fused: {pps:.0f} p/s", file=sys.stderr)
    return pps


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
    if not _tpu_reachable():
        _emit({
            "metric": f"query_qps_{N_DOCS // 1000}k_docs_top{TOPK}",
            "value": None, "unit": "qps", "vs_baseline": None,
            "error": "TPU unreachable: device probe timed out (relay down?)",
        })
        return
    try:
        tpu_qps = bench_tpu(queries)
    except Exception as exc:  # transient compile-relay failures: retry smaller
        print(f"# bench at {N_DOCS} docs failed ({type(exc).__name__}: {exc}); "
              f"retrying at {N_DOCS // 4}", file=sys.stderr)
        N_DOCS //= 4
        tpu_qps = bench_tpu(queries)

    extras = []

    def checkpoint_extras():
        # partial on-disk record: a mid-run relay drop / kill still leaves
        # every already-measured metric recoverable (VERDICT r3 #1)
        try:
            path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_local_partial.json")
            with open(path, "w") as f:
                json.dump({"headline_qps": round(tpu_qps, 1),
                           "extras": extras}, f)
        except OSError:
            pass

    def run_extra(name, unit, fn, baseline, invert=False):
        try:
            value = fn()
            ratio = (baseline / value) if invert else (value / baseline)
            extras.append({"metric": name, "value": round(value, 1),
                           "unit": unit, "vs_baseline": round(ratio, 2)})
        except Exception as exc:
            print(f"# extra {name} failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
            extras.append({"metric": name, "value": None, "unit": unit,
                           "vs_baseline": None,
                           "error": f"{type(exc).__name__}: {exc}"})
        checkpoint_extras()

    def on_row(metric, value, unit, vs):
        extras.append({"metric": metric, "value": value, "unit": unit,
                       "vs_baseline": vs})
        checkpoint_extras()

    if os.environ.get("BENCH_SKIP_EXTRAS") != "1":
        # ---- core arms first (the r2/r3 driver metric set + the encode
        # family): these MUST land before any expensive trained build so a
        # driver timeout can never again erase the whole record (r4 rc=124)
        run_extra(f"query_qps_{N_DOCS // 1000}k_docs_serve",
                  "qps", lambda: bench_serve(queries), cpu_qps * (orig_n / N_DOCS))
        run_extra("train_step_ms_bertbase", "ms", bench_train_step,
                  R1_TRAIN_STEP_MS, invert=True)
        run_extra("encode_passages_per_s", "passages/s", bench_encode,
                  R1_ENCODE_PPS)
        # fused-attention encode: vs_baseline = ratio over the xla row just
        # measured (same session), the VERDICT r4 #5 comparison
        _xla_pps = next((e["value"] for e in extras
                         if e["metric"] == "encode_passages_per_s"), None)
        if _xla_pps:
            run_extra("encode_passages_per_s_fused_attn", "passages/s",
                      bench_encode_fused, _xla_pps)
        # varlen: vs_baseline = bucketed / fixed-pad, measured THIS session
        run_extra("encode_passages_per_s_varlen_bucketed", "passages/s",
                  bench_encode_varlen, 1.0)
        if _VARLEN_STATE.get("fixed") is not None and extras[-1]["value"]:
            extras[-1]["vs_baseline"] = round(
                extras[-1]["value"] / _VARLEN_STATE["fixed"], 2)
            extras.append({
                "metric": "encode_passages_per_s_varlen_fixedpad",
                "value": round(_VARLEN_STATE["fixed"], 1),
                "unit": "passages/s", "vs_baseline": None,
            })
            checkpoint_extras()
        # production config: bucketed + fused encoder kernels, vs this
        # session's fixed-pad xla arm (the 2.54x README claim)
        if _VARLEN_STATE.get("fixed") and _gate("bucketed_fused", 150):
            run_extra("encode_passages_per_s_bucketed_fused", "passages/s",
                      bench_encode_varlen_fused, _VARLEN_STATE["fixed"])
        run_extra(f"query_qps_int8_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                  "qps", lambda: bench_int8(queries), R1_INT8_QPS)
        # native-int8 MXU kernel (mode='approx' on int8 indexes): vs_baseline
        # is the ratio to the bf16-query serve QPS measured THIS run
        if _I8Q_STATE.get("qps") is not None:
            extras.append({
                "metric": f"query_qps_int8_native_{N_DOCS_INT8 // 1000}k_docs"
                          f"_top{TOPK}",
                "value": round(_I8Q_STATE["qps"], 1), "unit": "qps",
                "vs_baseline": round(
                    _I8Q_STATE["qps"] / _IVF_STATE["exact_qps"], 2),
            })
            extras.append({
                "metric": f"recall{TOPK}_int8_native_{N_DOCS_INT8 // 1000}k",
                "value": round(_I8Q_STATE["recall"], 4), "unit": "recall",
                "vs_baseline": round(_I8Q_STATE["recall"] / 0.95, 3),
            })
        # IVF bulk on the SAME clustered 8.8M corpus: vs_baseline is the
        # ratio to the exact-int8 serve QPS measured THIS run — the number
        # IVF must beat (VERDICT r2 #1); companion recall metric vs the
        # exact reference.  Budget-gated: the two-pass 8.8M build is the
        # most expensive single step in the bench (cold ~300 s).
        ivf_warm = (_cache_get("ivf_train_v1_nlist256") is not None and
                    _cache_get(f"ivf_assign_v1_nlist256_n{N_DOCS_INT8}")
                    is not None)
        if _gate("ivf8.8M", 230 if ivf_warm else 340):
            run_extra(f"ivf_qps_int8_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                      "qps", lambda: bench_ivf_int8(queries),
                      _IVF_STATE.get("exact_qps") or R1_INT8_QPS)
        if _IVF_STATE.get("recall") is not None:
            extras.append({
                "metric": f"ivf_recall{TOPK}_int8_{N_DOCS_INT8 // 1000}k",
                "value": round(_IVF_STATE["recall"], 4), "unit": "recall",
                "vs_baseline": round(_IVF_STATE["recall"] / 0.98, 3),
            })
        if _IVF_STATE.get("qps_native") is not None:
            extras.append({
                "metric": f"ivf_qps_int8_native_{N_DOCS_INT8 // 1000}k"
                          f"_docs_top{TOPK}",
                "value": round(_IVF_STATE["qps_native"], 1), "unit": "qps",
                "vs_baseline": round(
                    _IVF_STATE["qps_native"]
                    / (_IVF_STATE.get("exact_qps") or R1_INT8_QPS), 2),
            })
            extras.append({
                "metric": f"ivf_recall{TOPK}_int8_native_{N_DOCS_INT8//1000}k",
                "value": round(_IVF_STATE["recall_native"], 4),
                "unit": "recall",
                "vs_baseline": round(_IVF_STATE["recall_native"] / 0.98, 3),
            })
        # small-batch latency surface (VERDICT r3 weak 4): p50 ms per call at
        # B=1/8/64 on the same 8.8M int8 corpus; the IVF rows' vs_baseline is
        # flat_latency/ivf_latency at the same B (>1 means IVF wins the
        # latency regime, the r2/r3 conjecture this measures)
        for B_lat in LAT_BATCHES:
            f_ms = _LAT_STATE.get(f"flat_b{B_lat}")
            v_ms = _LAT_STATE.get(f"ivf_b{B_lat}")
            if f_ms is not None:
                extras.append({
                    "metric": f"serve_latency_ms_b{B_lat}_int8_"
                              f"{N_DOCS_INT8 // 1000}k",
                    "value": round(f_ms, 2), "unit": "ms",
                    "vs_baseline": None,
                })
            if v_ms is not None:
                extras.append({
                    "metric": f"ivf_latency_ms_b{B_lat}_int8_"
                              f"{N_DOCS_INT8 // 1000}k",
                    "value": round(v_ms, 2), "unit": "ms",
                    # guard BOTH operands: _p50_latency_ms clamps to 0.0
                    # when the relay roundtrip swamps the call time
                    "vs_baseline": (round(f_ms / v_ms, 2)
                                    if f_ms and v_ms else None),
                })
        checkpoint_extras()
        # the 21M bench times the packed sq4 SERVE kernel — labeled so
        # (VERDICT r2 weak #6); the certified-exact sq4 path is covered by
        # the kernel suite (ops/topk.py pallas_topk int4)
        if _gate("int4_21M", 200):
            run_extra(f"query_qps_int4_{N_DOCS_INT4 // 1000}k_docs_serve",
                      "qps", lambda: bench_int4_21m(queries),
                      cpu_qps * (orig_n / N_DOCS_INT4))
        # native-int8 sq4 kernel (mode='approx' on int4 indexes): vs_baseline
        # is the ratio to the bf16-query serve QPS measured THIS run
        if _I4Q_STATE.get("qps") is not None:
            extras.append({
                "metric": f"query_qps_int4_native_{N_DOCS_INT4 // 1000}k"
                          f"_docs_top{TOPK}",
                "value": round(_I4Q_STATE["qps"], 1), "unit": "qps",
                "vs_baseline": round(
                    _I4Q_STATE["qps"]
                    / (extras[-1]["value"] or _I4Q_STATE["qps"]), 2),
            })
            extras.append({
                "metric": f"recall{TOPK}_int4_native_{N_DOCS_INT4 // 1000}k",
                "value": round(_I4Q_STATE["recall"], 4), "unit": "recall",
                "vs_baseline": round(_I4Q_STATE["recall"] / 0.95, 3),
            })
        # PCAR384,SQ4 at 8.8M (2 bits per original dim): vs_baseline is the
        # ratio to the spectrumed exact-int8 serve measured inside the same
        # function (same session, same data) — recorded as its own row
        pcar_est = ((0 if _SPEC_STATE.get("ref_ids") is not None else 220)
                    + (170 if _cache_get("pca384_v1") is not None else 210))
        if _gate("pcar384sq4", pcar_est):
            run_extra(f"pcar384sq4_qps_{N_DOCS_INT8 // 1000}k_docs_top{TOPK}",
                      "qps", lambda: bench_pcar_sq4(),
                      _IVF_STATE.get("exact_qps") or R1_INT8_QPS)
        if _PCAR_STATE.get("int8_qps") is not None:
            # rewrite the row's vs_baseline to the in-function denominator
            extras[-1]["vs_baseline"] = (
                round(extras[-1]["value"] / _PCAR_STATE["int8_qps"], 2)
                if extras[-1]["value"] else None)
            extras.append({
                "metric": f"pcar384sq4_recall{TOPK}_"
                          f"{N_DOCS_INT8 // 1000}k",
                "value": round(_PCAR_STATE["recall"], 4), "unit": "recall",
                "vs_baseline": round(_PCAR_STATE["recall"] / 0.81, 3),
            })
        if _PCAR_STATE.get("qps_i8q") is not None:
            extras.append({
                "metric": f"pcar384sq4_i8q_qps_{N_DOCS_INT8 // 1000}k"
                          f"_docs_top{TOPK}",
                "value": round(_PCAR_STATE["qps_i8q"], 1), "unit": "qps",
                "vs_baseline": round(
                    _PCAR_STATE["qps_i8q"] / _PCAR_STATE["int8_qps"], 2),
            })
            extras.append({
                "metric": f"pcar384sq4_i8q_recall{TOPK}_"
                          f"{N_DOCS_INT8 // 1000}k",
                "value": round(_PCAR_STATE["recall_i8q"], 4),
                "unit": "recall",
                "vs_baseline": round(_PCAR_STATE["recall_i8q"] / 0.81, 3),
            })
        checkpoint_extras()
        # PQ / OPQ / IVF-PQ ladder at 8.8M (96 B/row rungs): sub-arms run in
        # value order inside bench_pq_family, each budget-gated, each
        # checkpointing its rows the moment it lands (on_row)
        try:
            bench_pq_family(on_row)
        except Exception as exc:
            print(f"# pq family failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        checkpoint_extras()

    # the cpu baseline was scaled to orig_n docs; rescale if the tpu run shrank
    cpu_qps_at_n = cpu_qps * (orig_n / N_DOCS)
    _emit({
        "metric": f"query_qps_{N_DOCS // 1000}k_docs_top{TOPK}",
        "value": round(tpu_qps, 1),
        "unit": "qps",
        "vs_baseline": round(tpu_qps / cpu_qps_at_n, 2),
        "extras": extras,
    })


def _emit(payload: dict) -> None:
    """Print the ONE driver-schema JSON line AND persist it to
    BENCH_local.json next to this script (VERDICT r3 #1: a capture-time relay
    outage must never again erase a measured record — the local artifact is
    committed after every hardware session as BENCH_local_rN.json)."""
    line = json.dumps(payload)
    print(line)
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_local.json")
        with open(path, "w") as f:
            f.write(line + "\n")
    except OSError as exc:
        print(f"# could not write BENCH_local.json: {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
