"""Trained coarse ANN index: IVF-flat on TPU (k-means + centroid-pruned search).

This is the TPU-native answer to the reference's trained FAISS factory
indexes (``FaissRetriever`` wrapping ``faiss.index_factory`` + ``train()``,
``DRT/evaluator/index.py:47-54``): where a flat scan touches every corpus row,
IVF visits only the ``nprobe`` most promising of ``nlist`` k-means cells.

TPU-first design decisions (vs FAISS's CPU pointer-chasing inverted lists):

- **training** is Lloyd's k-means run entirely on device: assignment is one
  MXU matmul per corpus block (argmax of ``x·cᵀ − ½‖c‖²`` — the L2 argmin),
  the centroid update is a one-hot matmul segment-sum accumulated in a
  ``lax.scan`` carry, so HBM traffic is one corpus pass per iteration;
- **storage** is cluster-major with a FIXED per-cell capacity (static shapes
  — XLA cannot tile ragged inverted lists): values ``[nlist, C, dim]`` +
  row ids ``[nlist, C]``.  Rows beyond a cell's capacity spill into a flat
  **overflow slab that every search scans exactly**, so skewed clusters cost
  bandwidth instead of recall;
- **search** is jitted end-to-end: probe scores ``q·centroidsᵀ`` → top-nprobe
  cells → gather the probed cells' rows → MXU dot → masked top-k, processed
  in query tiles to bound the gather workspace; int8 cells dequantize in the
  dot via per-row scales.

``index_factory("IVF4096,Flat")`` / ``"IVF4096,SQ8"`` construct it (see
``index/flat.py:index_factory`` for the flat strings).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flat import blockwise_topk, quantize_int8
from .modes import resolve_ivf_mode


@functools.partial(jax.jit, static_argnames=("nlist", "iters", "block"))
def _kmeans_device(corpus: jax.Array, init: jax.Array, nlist: int,
                   iters: int, block: int) -> jax.Array:
    """Lloyd's k-means over corpus blocks; returns centroids [nlist, dim]."""
    N, H = corpus.shape
    n_blocks = -(-N // block)
    pad = n_blocks * block - N
    padded = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    blocks = padded.reshape(n_blocks, block, H)
    row_valid = (jnp.arange(n_blocks * block) < N).reshape(n_blocks, block)

    def one_iter(centroids, _):
        half_norm = 0.5 * jnp.sum(centroids * centroids, axis=1)

        def scan_block(carry, xs):
            sums, counts = carry
            x, valid = xs
            # L2 argmin == argmax(x·c − ½‖c‖²); one MXU matmul per block
            scores = jnp.dot(x, centroids.T,
                             preferred_element_type=jnp.float32) - half_norm
            assign = jnp.argmax(scores, axis=1)
            onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
            onehot = onehot * valid[:, None].astype(jnp.float32)
            sums = sums + jnp.dot(onehot.T, x.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(onehot, axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            scan_block,
            (jnp.zeros((nlist, H), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
            (blocks, row_valid),
        )
        # empty cells keep their previous centroid
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None],
                        centroids)
        return new, None

    centroids, _ = jax.lax.scan(one_iter, init.astype(jnp.float32),
                                None, length=iters)
    return centroids


def _split_heavy_cells(corpus_d, centroids, nlist: int, block: int,
                       rounds: int = 2, iters: int = 4, seed: int = 0):
    """Rebalance Lloyd's output: random-row init leaves ~1/e of the cells
    starving (init collisions), which inflates the fixed cell capacity. Each
    round moves the emptiest centroids next to the heaviest ones (perturbed
    copies — the split halves the heavy cell) and re-runs a few Lloyd's
    iterations. Host work is one [N] bincount per round."""
    rng = np.random.default_rng(seed)
    for _ in range(rounds):
        assign = np.asarray(_assign_device(corpus_d, centroids, block))
        counts = np.bincount(assign, minlength=nlist)
        mean = counts.mean()
        heavy = np.argsort(-counts)
        light = np.argsort(counts)
        n_move = int(min((counts[light] < mean / 4).sum(),
                         (counts[heavy] > 2 * mean).sum()))
        if n_move == 0:
            break
        c_host = np.array(centroids)  # writable host copy
        eps = rng.standard_normal((n_move, c_host.shape[1])).astype(np.float32)
        c_host[light[:n_move]] = c_host[heavy[:n_move]] + 1e-3 * eps
        centroids = _kmeans_device(corpus_d, jnp.asarray(c_host), nlist,
                                   iters, block)
    return centroids


@functools.partial(jax.jit, static_argnames=("C", "nlist", "n_ovf"))
def _bucket_device(reps, assign, starts, C: int, nlist: int, n_ovf: int,
                   scales=None):
    """Scatter rows into the cluster-major fixed-capacity layout ON DEVICE.

    reps [N, dim] (any dtype — int8 rows scatter as int8, so the buffer never
    exists at a wider dtype), assign [N] int32, starts [nlist] int32 (cell
    start offsets in the stably-sorted order), optional per-row ``scales``
    [N] (int8 dequant) scattered alongside. Rows ranked beyond a cell's
    capacity C spill to the overflow slab (exactly n_ovf of them — computed
    host-side from the tiny [N] assignment vector, the ONLY device→host
    transfer of the build).

    Returns (values [nlist*C, dim], row_ids [nlist*C] int32 with -1 = empty,
    cell_scales [nlist*C] | None, ovf_rows [n_ovf, dim], ovf_ids [n_ovf],
    ovf_scales [n_ovf] | None)."""
    N = reps.shape[0]
    order = jnp.argsort(assign)                    # stable in jnp
    sa = assign[order]
    pos = jnp.arange(N, dtype=jnp.int32) - starts[sa]
    in_cell = pos < C
    dest = jnp.where(in_cell, sa * C + pos, nlist * C)  # OOB index → dropped
    values = jnp.zeros((nlist * C, reps.shape[1]), reps.dtype)
    values = values.at[dest].set(reps[order], mode="drop")
    row_ids = jnp.full((nlist * C,), -1, jnp.int32)
    row_ids = row_ids.at[dest].set(order.astype(jnp.int32), mode="drop")
    cell_scales = None
    if scales is not None:
        cell_scales = jnp.ones((nlist * C,), jnp.float32)
        cell_scales = cell_scales.at[dest].set(scales[order], mode="drop")
    ovf_scales = None
    if n_ovf:
        # stable partition: in-capacity rows first, overflow rows last
        p2 = jnp.argsort(jnp.where(in_cell, 0, 1))
        ovf_ids = order[p2][N - n_ovf:].astype(jnp.int32)
        ovf_rows = reps[ovf_ids]
        if scales is not None:
            ovf_scales = scales[ovf_ids]
    else:
        ovf_ids = jnp.zeros((0,), jnp.int32)
        ovf_rows = jnp.zeros((0, reps.shape[1]), reps.dtype)
        if scales is not None:
            ovf_scales = jnp.zeros((0,), jnp.float32)
    return values, row_ids, cell_scales, ovf_rows, ovf_ids, ovf_scales


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_device(corpus: jax.Array, centroids: jax.Array, block: int) -> jax.Array:
    """Nearest-centroid (L2) assignment per corpus row → [N] int32."""
    N, H = corpus.shape
    n_blocks = -(-N // block)
    pad = n_blocks * block - N
    padded = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    blocks = padded.reshape(n_blocks, block, H)
    half_norm = 0.5 * jnp.sum(centroids * centroids, axis=1)

    def scan_block(_, x):
        scores = jnp.dot(x, centroids.T,
                         preferred_element_type=jnp.float32) - half_norm
        return None, jnp.argmax(scores, axis=1).astype(jnp.int32)

    _, assign = jax.lax.scan(scan_block, None, blocks)
    return assign.reshape(-1)[:N]


class IVFFlatIndex:
    """Trained inverted-file flat index (inner-product metric).

    API mirror of the reference's trained-index role: ``train`` → ``add`` →
    ``search``; search touches ~``nprobe/nlist`` of the corpus plus the
    overflow slab. fp32 / bfloat16 / int8 (per-row scales) cell storage."""

    def __init__(self, dim: int, nlist: int = 1024, nprobe: int = 32,
                 dtype: str = "float32", capacity_factor: float = 2.0,
                 query_tile: int = 16, train_block: int = 8192,
                 ovf_frac: float = 0.02, max_capacity_factor: float = 8.0,
                 qcap_factor: float = 2.0):
        self.dim = dim
        self.nlist = nlist
        self.nprobe = min(nprobe, nlist)
        self.dtype = dtype
        self.capacity_factor = capacity_factor
        self.query_tile = query_tile
        self.train_block = train_block
        # bulk (cell-major) search: per-cell query capacity = qcap_factor x
        # the mean probe load B*nprobe/nlist; probes beyond a hot cell's
        # capacity are dropped and counted in ``last_dropped``
        self.qcap_factor = qcap_factor
        self.last_dropped = 0
        # hot-cell densification budget for the bulk tuner (None = nlist/16):
        # overloaded cells move to the densely-scanned side slab instead of
        # dropping probe pairs; raising this trades side-scan FLOPs for recall
        self.max_hot: Optional[int] = None
        # adaptive capacity: grow cells past capacity_factor x mean until the
        # overflow slab holds <= ovf_frac of the rows (skewed cluster sizes —
        # e.g. isotropic data — would otherwise spill half the corpus to the
        # exactly-scanned slab), bounded by max_capacity_factor x mean HBM
        self.ovf_frac = ovf_frac
        self.max_capacity_factor = max_capacity_factor
        self.centroids: Optional[jax.Array] = None  # [nlist, dim] fp32
        self._values = None      # [nlist, C, dim] cell rows
        self._scales = None      # [nlist, C] for int8
        self._row_ids = None     # [nlist, C] int32, -1 = empty slot
        self._ovf_values = None  # [M, dim] overflow slab (flat-scanned)
        self._ovf_scales = None
        self._ovf_ids = None
        self._n = 0
        self.docid: List = []
        self._search_fn = None
        self._bulk_state = None

    def __len__(self):
        return self._n

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None

    # -- training --------------------------------------------------------------

    def train(self, reps, iters: int = 10, seed: int = 0) -> None:
        """On-device Lloyd's k-means (the faiss ``index.train()`` role).

        Accepts host numpy OR a device array; device input never round-trips
        to host (init centroids are gathered on device from host-drawn row
        indices)."""
        n = int(reps.shape[0])
        assert n >= self.nlist, (
            f"need >= nlist={self.nlist} training rows, got {n}")
        rng = np.random.default_rng(seed)
        sel = np.sort(rng.choice(n, self.nlist, replace=False)).astype(np.int32)
        reps_d = jnp.asarray(reps, jnp.float32)
        init = reps_d[jnp.asarray(sel)]
        block = min(self.train_block, n)
        centroids = _kmeans_device(reps_d, init, self.nlist, iters, block)
        # rebalance: split the heaviest cells into the starving ones (cuts
        # the fixed cell capacity the skewed counts would otherwise force)
        self.centroids = _split_heavy_cells(
            reps_d, centroids, self.nlist, block, seed=seed)
        self._search_fn = None
        self._bulk_state = None

    # -- population -------------------------------------------------------------

    def add(self, reps: np.ndarray) -> None:
        """Assign + bucket into the fixed-capacity cluster-major layout, ON
        DEVICE (reps cross host→device once; the bucketing scatter and the
        int8 quantization never round-trip). Capacity overflow spills to the
        exact slab."""
        self.add_device(jnp.asarray(np.asarray(reps, np.float32)))

    def _capacity(self, counts: np.ndarray, N: int) -> int:
        """Fixed per-cell capacity: capacity_factor x mean, grown until the
        overflow slab holds <= ovf_frac of the rows (bounded by
        max_capacity_factor).  Capacities above 512 round to 512 multiples so
        the bulk kernel can tile cells with 512/1024/2048 blocks."""
        mean = max(1.0, N / self.nlist)

        def round_cap(c: float) -> int:
            g = 512 if c > 512 else 8
            return int(-(-c // g) * g)

        C = round_cap(self.capacity_factor * mean)
        c_max = max(C, round_cap(self.max_capacity_factor * mean))
        while C < c_max and np.maximum(counts - C, 0).sum() > self.ovf_frac * N:
            C = round_cap(C + (512 if C >= 512 else 8))
        return C

    def add_chunks(self, chunk_fn, n_rows: int,
                   chunk_rows: int = 500_000) -> None:
        """Incremental two-pass build for corpora too large to coexist with
        the cell buffer in HBM (the one-shot ``add_device`` peaks at input
        reps + capacity_factor x corpus bytes; this path peaks at the cell
        buffer + ONE chunk).

        ``chunk_fn(start, rows)`` must deterministically return the corpus
        rows ``[start, start+rows)`` as a FRESH device array [rows, dim] — it
        is called once per chunk per pass (pass 1 assigns, pass 2 quantizes +
        scatters) and each returned array is CONSUMED (deleted) to bound HBM.
        Host work is O(N) int32 vectors (the assignment and the destination
        map), never row data."""
        if not self.is_trained:
            raise RuntimeError("IVFFlatIndex.add_chunks before train()")
        if self._values is not None:
            raise RuntimeError("IVFFlatIndex build is one-shot")
        N = int(n_rows)

        # pass 1: nearest-centroid assignment, chunk at a time
        assign_all = np.empty(N, np.int32)
        for start in range(0, N, chunk_rows):
            rows = min(chunk_rows, N - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            a = _assign_device(
                chunk.astype(jnp.float32) if chunk.dtype == jnp.bfloat16
                else chunk,
                self.centroids, min(8192, max(8, rows)))
            assign_all[start:start + rows] = np.asarray(a)
            chunk.delete()
        counts = np.bincount(assign_all, minlength=self.nlist)
        C = self._capacity(counts, N)
        starts = np.zeros(self.nlist, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])

        # host destination map: cluster-major slot per row (or overflow)
        order = np.argsort(assign_all, kind="stable")
        sa = assign_all[order]
        pos = np.arange(N, dtype=np.int64) - starts[sa]
        in_cell = pos < C
        dest_sorted = np.where(in_cell, sa.astype(np.int64) * C + pos, -1)
        dest = np.empty(N, np.int64)
        dest[order] = dest_sorted
        row_ids_flat = np.full(self.nlist * C, -1, np.int32)
        valid = dest_sorted >= 0
        row_ids_flat[dest_sorted[valid]] = order[valid].astype(np.int32)

        # pass 2: quantize/cast + scatter each chunk into the cell buffer
        int8 = self.dtype == "int8"
        cell_dtype = (jnp.int8 if int8 else
                      jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32)
        values = jnp.zeros((self.nlist, C, self.dim), cell_dtype)
        scales = jnp.ones((self.nlist, C), jnp.float32) if int8 else None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def place(buf, rows_q, ci, pi):
            return buf.at[ci, pi].set(rows_q, mode="drop")

        ovf_parts_v, ovf_parts_s, ovf_parts_i = [], [], []
        if int8:
            from ..ops.quant import quantize_int8_device
        for start in range(0, N, chunk_rows):
            rows = min(chunk_rows, N - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            if int8:
                qv, qs = quantize_int8_device(
                    chunk.astype(jnp.float32) if chunk.dtype == jnp.bfloat16
                    else chunk,
                    block_rows=min(1024, rows))
            else:
                qv, qs = chunk.astype(cell_dtype), None
            if qv is not chunk:  # astype is a no-op when dtypes match
                chunk.delete()
            d = dest[start:start + rows]
            oob = d < 0
            ci = jnp.asarray(np.where(oob, self.nlist, d // C).astype(np.int32))
            pi = jnp.asarray(np.where(oob, 0, d % C).astype(np.int32))
            values = place(values, qv, ci, pi)
            if qs is not None:
                scales = scales.at[ci, pi].set(qs, mode="drop")
            if oob.any():
                local = np.nonzero(oob)[0].astype(np.int32)
                sel = jnp.asarray(local)
                ovf_parts_v.append(np.asarray(qv[sel]))
                ovf_parts_i.append(start + local)  # ids in CHUNK order,
                # matching the value parts' concatenation order
                if qs is not None:
                    ovf_parts_s.append(np.asarray(qs[sel]))
            qv.delete()
            if qs is not None:
                qs.delete()
        self._values = values
        self._scales = scales
        self._row_ids = jnp.asarray(row_ids_flat.reshape(self.nlist, C))
        n_ovf = int((~valid).sum())
        if n_ovf:
            self._ovf_ids = jnp.asarray(
                np.concatenate(ovf_parts_i).astype(np.int32))
            self._ovf_values = jnp.asarray(np.concatenate(ovf_parts_v))
            self._ovf_scales = (jnp.asarray(np.concatenate(ovf_parts_s))
                                if ovf_parts_s else None)
        self._n = N
        self._search_fn = None
        self._bulk_state = None

    def add_device(self, reps) -> None:
        """Device-native build: bucket device-resident encoder output without
        any host staging. Only the [N] int32 assignment vector is pulled to
        host (for cell counts / overflow sizing — both shape-defining).

        HBM note: the cluster-major buffer is ``capacity_factor`` x the corpus
        bytes at cell dtype; at 10M+ rows prefer int8 cells and/or a lower
        capacity_factor (spilling more rows to the exact overflow slab)."""
        if not self.is_trained:
            raise RuntimeError("IVFFlatIndex.add before train()")
        if self._values is not None:
            raise RuntimeError("IVFFlatIndex.add is one-shot; concatenate first")
        reps = jnp.asarray(reps)
        N = int(reps.shape[0])
        assign = _assign_device(
            reps.astype(jnp.float32) if reps.dtype == jnp.bfloat16 else reps,
            self.centroids, min(8192, max(8, N)))
        counts = np.bincount(np.asarray(assign), minlength=self.nlist)
        C = self._capacity(counts, N)
        n_ovf = int((counts - np.minimum(counts, C)).sum())
        starts = np.zeros(self.nlist, np.int32)
        np.cumsum(counts[:-1], out=starts[1:])

        if self.dtype == "int8":
            # quantize the ROWS first so the scatter moves int8 (the cell
            # buffer never exists at a wider dtype — peak HBM matters at 1M+)
            from ..ops.quant import quantize_int8_device

            qv, qs = quantize_int8_device(
                reps if reps.dtype != jnp.bfloat16 else reps.astype(jnp.float32))
            values, row_ids, cell_scales, ovf_rows, ovf_ids, ovf_scales = \
                _bucket_device(qv, assign, jnp.asarray(starts),
                               C, self.nlist, n_ovf, scales=qs)
            self._values = values.reshape(self.nlist, C, self.dim)
            self._scales = cell_scales.reshape(self.nlist, C)
        else:
            cell_dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            values, row_ids, _, ovf_rows, ovf_ids, _ = _bucket_device(
                reps.astype(cell_dtype), assign, jnp.asarray(starts),
                C, self.nlist, n_ovf)
            ovf_scales = None
            self._values = values.reshape(self.nlist, C, self.dim)
            self._scales = None
        self._row_ids = row_ids.reshape(self.nlist, C)

        if n_ovf:
            self._ovf_ids = ovf_ids
            self._ovf_values = ovf_rows
            self._ovf_scales = ovf_scales
        self._n = N
        self._search_fn = None
        self._bulk_state = None

    # -- search ------------------------------------------------------------------

    def _build_search(self, k: int, nprobe: int):
        C = self._values.shape[1]
        # bound the per-tile cell gather (tile x nprobe x C x dim at cell
        # dtype) to ~1 GB so large (nprobe, C) combinations cannot OOM
        bytes_per_q = nprobe * C * self.dim * self._values.dtype.itemsize
        tile = max(1, min(self.query_tile, (1 << 30) // max(1, bytes_per_q)))

        # the cell arrays are RUNTIME ARGUMENTS, never jit-captured constants:
        # closure-captured device arrays are serialized with the computation
        # at lowering (multi-GB through a remote-compile path)
        def probe_tile(q, centroids, values, row_ids, scales,
                       ovf_v, ovf_s, ovf_i):  # q: [T, dim] fp32
            # 1) probe cells by INNER PRODUCT (faiss IVF-IP semantics)
            cell_scores = jnp.dot(q, centroids.T,
                                  preferred_element_type=jnp.float32)
            _, cells = jax.lax.top_k(cell_scores, nprobe)       # [T, nprobe]
            # 2) gather the probed cells' rows and score on the MXU
            rows = values[cells]                                # [T, np, C, dim]
            ids = row_ids[cells].reshape(q.shape[0], nprobe * C)
            qc = q.astype(rows.dtype if rows.dtype == jnp.bfloat16 else jnp.float32)
            s = jnp.einsum("td,tpcd->tpc", qc,
                           rows.astype(qc.dtype),
                           preferred_element_type=jnp.float32)
            if scales is not None:
                s = s * scales[cells]
            s = s.reshape(q.shape[0], nprobe * C)
            s = jnp.where(ids >= 0, s, -jnp.inf)
            top_s, pos = jax.lax.top_k(s, k)
            top_i = jnp.take_along_axis(ids, pos, axis=1)
            # 3) overflow slab: scanned exactly by every query, reduced to
            # its own top-k FIRST so the final merge is 2k wide (a single
            # top_k over nprobe*C + n_ovf columns gets slow when the slab is
            # large)
            if ovf_v is not None:
                so = jnp.dot(qc, ovf_v.astype(qc.dtype).T,
                             preferred_element_type=jnp.float32)
                if ovf_s is not None:
                    so = so * ovf_s[None, :]
                k2 = min(k, so.shape[1])
                so_top, so_pos = jax.lax.top_k(so, k2)
                so_ids = jnp.take(ovf_i, so_pos)
                all_s = jnp.concatenate([top_s, so_top], axis=1)
                all_i = jnp.concatenate([top_i, so_ids], axis=1)
                top_s, pos2 = jax.lax.top_k(all_s, k)
                top_i = jnp.take_along_axis(all_i, pos2, axis=1)
            return top_s, top_i

        jitted = jax.jit(probe_tile)

        def fn(q):
            return jitted(q, self.centroids, self._values, self._row_ids,
                          self._scales, self._ovf_values, self._ovf_scales,
                          self._ovf_ids)

        return fn, tile

    def _pick_block(self) -> int:
        """Cell-block size for the bulk kernel: the largest VMEM-safe block
        dividing the cell capacity C (add_device rounds C to a 512 multiple
        above 512, so one of these always divides)."""
        return self._bulk_tiles(256, 100)[0]

    def _bulk_tiles(self, Qcap: int, k: int) -> Tuple[int, int]:
        """(block, J) for the bulk kernel under a joint VMEM budget: the
        kernel holds [Qcap, block] fp32 scores + an int32 packed copy + the
        double-buffered operand tiles, so Qcap x block is capped at 256k
        elements (hardware-verified: 512x2048 with J~49 blows the 16 MB
        scoped-vmem limit)."""
        from ..ops.ivf_bulk import serve_j

        C = int(self._values.shape[1])
        caps = (1024, 512) if self.dtype == "float32" else (2048, 1024, 512)
        for b in caps:
            if C >= b and C % b == 0 and max(8, Qcap) * b <= 262144:
                break
        else:
            b = 512 if C >= 512 and C % 512 == 0 else C
        J = serve_j(k, b, C)
        if getattr(self, "bulk_j", None):
            # experimentation override: selection cost is J sequential VPU
            # reductions per grid step, so J is the bulk path's main
            # recall/throughput dial beyond nprobe
            J = min(self.bulk_j, k, b)
        return b, J

    SIDE_BLOCK = 512  # side-scan kernel block (and slab padding granule)

    def _side_slab(self, hot_ids: np.ndarray):
        """Dense side-scan slab = overflow rows + the rows of hot cells,
        padded to a block multiple for the flat packed kernel.  Hot cells are
        excluded from probing (see search_bulk) and instead scanned exactly
        by every query — IP-metric probing concentrates all queries on a few
        large-norm centroids, which is precisely the shared-operand dense
        scan's best case."""
        parts_v, parts_s, parts_i = [], [], []
        if self._ovf_values is not None:
            parts_v.append(self._ovf_values)
            parts_i.append(self._ovf_ids)
            if self._ovf_scales is not None:
                parts_s.append(self._ovf_scales)
        if hot_ids.size:
            hv = self._values[jnp.asarray(hot_ids)].reshape(-1, self.dim)
            hi = self._row_ids[jnp.asarray(hot_ids)].reshape(-1)
            parts_v.append(hv)
            parts_i.append(hi)
            if self._scales is not None:
                parts_s.append(self._scales[jnp.asarray(hot_ids)].reshape(-1))
        if not parts_v:
            return None, None, None, 0
        sv = jnp.concatenate(parts_v) if len(parts_v) > 1 else parts_v[0]
        si = jnp.concatenate(parts_i) if len(parts_i) > 1 else parts_i[0]
        ss = (jnp.concatenate(parts_s) if len(parts_s) > 1 else parts_s[0]) \
            if parts_s else None
        # empty capacity slots in hot cells carry row_id -1 / zero vectors:
        # give them -inf by zeroing... they are masked by the packed kernel's
        # position bound only, so move them OUT by sorting valid rows first
        valid = np.asarray(si) >= 0
        order = np.argsort(~valid, kind="stable")
        sv = sv[jnp.asarray(order)]
        si = si[jnp.asarray(order)]
        if ss is not None:
            ss = ss[jnp.asarray(order)]
        n_valid = int(valid.sum())
        pad = (-sv.shape[0]) % self.SIDE_BLOCK
        if pad:
            sv = jnp.pad(sv, ((0, pad), (0, 0)))
            si = jnp.pad(si, (0, pad))
            if ss is not None:
                ss = jnp.pad(ss, (0, pad))
        return sv, ss, si, n_valid

    def search_bulk(self, q_reps: np.ndarray, k: int = 100,
                    nprobe: Optional[int] = None,
                    i8_native: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Cell-major bulk search (ops/ivf_bulk.py): MXU-form probe scoring
        for query batches — the serving path that makes IVF beat the exact
        kernels (VERDICT r2 next-round #1).  Scores are packed-selection
        quantized (~1e-4 relative) like the flat serve kernel.
        ``i8_native`` (int8 cells only): int8-quantized queries + the MXU's
        s8·s8→s32 mode in the cell/side kernels.

        Self-tuning: the first batch teaches the index (a) its HOT cells —
        cells whose probe load exceeds any reasonable per-cell query capacity
        (an intrinsic property of IP probing: large-norm centroids attract
        every query) get moved to the dense side-scan and masked from
        probing — and (b) the per-cell query capacity Qcap.  Both are cached;
        steady-state serving re-runs nothing."""
        if self._values is None:
            raise RuntimeError("IVFFlatIndex.search before add()")
        from ..ops.ivf_bulk import ivf_bulk_search, serve_j

        k = min(k, self._n)
        nprobe = self.nprobe if nprobe is None else min(nprobe, self.nlist)
        q = np.asarray(q_reps, np.float32)
        B0 = q.shape[0]
        pad = (-B0) % (256 if B0 > 256 else 8)
        if pad:
            q = np.concatenate([q, np.zeros((pad, self.dim), np.float32)])
        B = q.shape[0]
        C = int(self._values.shape[1])
        lam = B * nprobe / self.nlist
        # Qcap is PADDING: every cell's matmul is Qcap wide, so the per-query
        # compute multiplies by Qcap/lam.  Cap it at 4x the mean load and
        # densify anything hotter instead (hot cells cost one shared-operand
        # scan; Qcap padding costs every cell).
        qcap_cap = min(int(-(-B * nprobe // 8) * 8),
                       max(64, int(-(-4.0 * lam // 8) * 8)),
                       512)  # [Qcap, block] VMEM budget (see _bulk_tiles)
        state = getattr(self, "_bulk_state", None)
        if state is None or state["key"] != (nprobe,):
            hot = np.zeros((0,), np.int64)
            side = self._side_slab(hot)
            state = {"key": (nprobe,), "hot": hot, "side": side,
                     "qcap": None}
        Qcap = state["qcap"]
        if Qcap is None:
            Qcap = min(qcap_cap,
                       int(-(-max(8.0, self.qcap_factor * lam) // 8) * 8))

        while True:
            block, J = self._bulk_tiles(Qcap, k)
            sv, ss, si, side_valid = state["side"]
            hp = None
            if state["hot"].size:
                hp = jnp.zeros((self.nlist,), jnp.float32).at[
                    jnp.asarray(state["hot"])].set(-jnp.inf)
            # hot cells are excluded from probing (additive -inf) but
            # lax.top_k still returns nprobe cells: cap effective nprobe so a
            # hot cell is never both probed and side-scanned (duplicate
            # docids in the merged top-k; advisor r3)
            np_eff = min(nprobe, self.nlist - int(state["hot"].size))
            sb = self.SIDE_BLOCK
            side_J = serve_j(k, sb, max(sb, side_valid)) if side_valid else 4
            tv, doc, dropped, counts = ivf_bulk_search(
                jnp.asarray(q), self.centroids, self._values, self._row_ids,
                self._scales, sv, ss, si,
                k=k, nprobe=np_eff, Qcap=Qcap, J=J, block=block,
                nlist=self.nlist, C=C, hot_penalty=hp,
                side_valid=side_valid, side_J=side_J, side_block=sb,
                i8_native=bool(i8_native and self._scales is not None),
                n_real=B0)
            self.last_dropped = int(dropped)
            if self.last_dropped <= max(8, int(0.001 * B * nprobe)):
                break
            counts_np = np.asarray(counts)
            hot_thresh = max(2.0 * lam, float(Qcap))
            overloaded = np.where(counts_np > hot_thresh)[0]
            new_hot = np.setdiff1d(overloaded, state["hot"])
            max_hot = self.max_hot if self.max_hot is not None \
                else max(1, self.nlist // 16)
            if new_hot.size and state["hot"].size < max_hot:
                # move the most-overloaded cells to the dense side-scan
                new_hot = new_hot[np.argsort(-counts_np[new_hot])]
                room = max_hot - state["hot"].size
                state["hot"] = np.concatenate(
                    [state["hot"], new_hot[:room]]).astype(np.int64)
                state["side"] = self._side_slab(state["hot"])
                continue
            if Qcap >= qcap_cap:
                break  # graceful drops (rank-priority slotting) remain
            Qcap = min(qcap_cap, Qcap * 2)
        state["qcap"] = Qcap
        self._bulk_state = state
        return np.asarray(tv)[:B0], np.asarray(doc)[:B0]

    def search(self, q_reps: np.ndarray, k: int = 100,
               mode: str = "bulk",
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Centroid-pruned top-k.

        ``mode="bulk"`` (default; also "serve"): the cell-major MXU kernel —
        the bulk-throughput path.  ``mode="probe"``: the per-query-tile
        gathered einsum — exact fp32 probe scores, better at tiny
        latency-sensitive batches.  ``mode="i8q"`` (int8 cells only): the
        bulk kernel with int8-quantized queries in the MXU's s8·s8→s32 mode.
        ``mode="approx"``: per-dtype alias — i8q on int8 cells, bulk
        otherwise (index/modes.py, VERDICT r3 weak 5).  ``mode="exact"``:
        flat scan over the reconstructed corpus (parity checks)."""
        if self._values is None:
            raise RuntimeError("IVFFlatIndex.search before add()")
        mode = resolve_ivf_mode(mode, self.dtype)
        k = min(k, self._n)
        q = np.asarray(q_reps, np.float32)
        if mode == "exact":
            return self._search_exact(q, k)
        if mode in ("bulk", "serve", "i8q"):
            return self.search_bulk(q, k, nprobe=nprobe,
                                    i8_native=(mode == "i8q"))
        nprobe = self.nprobe if nprobe is None else min(nprobe, self.nlist)
        key = (k, nprobe)
        if self._search_fn is None or self._search_key != key:
            self._search_fn = self._build_search(k, nprobe)
            self._search_key = key
        fn, tile = self._search_fn
        out_s, out_i = [], []
        for s0 in range(0, q.shape[0], tile):
            qt = q[s0 : s0 + tile]
            valid = qt.shape[0]
            if valid < tile:
                qt = np.concatenate(
                    [qt, np.zeros((tile - valid, self.dim), np.float32)])
            ts, ti = fn(jnp.asarray(qt))
            out_s.append(np.asarray(ts)[:valid])
            out_i.append(np.asarray(ti)[:valid])
        return np.concatenate(out_s), np.concatenate(out_i)

    def _search_exact(self, q: np.ndarray, k: int):
        """Flat scan over every stored row (cells + overflow), exact."""
        mask = np.asarray(self._row_ids).reshape(-1) >= 0
        flat_ids = np.asarray(self._row_ids).reshape(-1)[mask]
        vals = np.asarray(self._values, np.float32).reshape(-1, self.dim)[mask]
        if self._scales is not None:
            vals = vals * np.asarray(self._scales).reshape(-1)[mask][:, None]
        if self._ovf_values is not None:
            ov = np.asarray(self._ovf_values, np.float32)
            if self._ovf_scales is not None:
                ov = ov * np.asarray(self._ovf_scales)[:, None]
            vals = np.concatenate([vals, ov])
            flat_ids = np.concatenate([flat_ids, np.asarray(self._ovf_ids)])
        s, i = blockwise_topk(jnp.asarray(q), jnp.asarray(vals), k,
                              min(4096, vals.shape[0]))
        return np.asarray(s), np.asarray(flat_ids)[np.asarray(i)]

    def batch_search(self, q_reps, k, batch_size, quiet=False,
                     mode: str = "bulk"):
        out_s, out_i = [], []
        for start in range(0, q_reps.shape[0], batch_size):
            s, i = self.search(q_reps[start : start + batch_size], k, mode=mode)
            out_s.append(s)
            out_i.append(i)
        return np.concatenate(out_s), np.concatenate(out_i)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "centroids": np.asarray(self.centroids, np.float32),
            "values": np.asarray(self._values),
            "row_ids": np.asarray(self._row_ids),
        }
        if self._scales is not None:
            payload["scales"] = np.asarray(self._scales)
        if self._ovf_values is not None:
            payload["ovf_values"] = np.asarray(self._ovf_values)
            payload["ovf_ids"] = np.asarray(self._ovf_ids)
            if self._ovf_scales is not None:
                payload["ovf_scales"] = np.asarray(self._ovf_scales)
        np.savez(path + ".npz", **payload)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"kind": "ivf", "dim": self.dim, "nlist": self.nlist,
                       "nprobe": self.nprobe, "dtype": self.dtype, "n": self._n,
                       "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str) -> "IVFFlatIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(meta["dim"], nlist=meta["nlist"], nprobe=meta["nprobe"],
                  dtype=meta["dtype"])
        with np.load(path + ".npz") as z:
            idx.centroids = jnp.asarray(z["centroids"])
            idx._values = jnp.asarray(z["values"])
            idx._row_ids = jnp.asarray(z["row_ids"])
            if "scales" in z:
                idx._scales = jnp.asarray(z["scales"])
            if "ovf_values" in z:
                idx._ovf_values = jnp.asarray(z["ovf_values"])
                idx._ovf_ids = jnp.asarray(z["ovf_ids"])
                if "ovf_scales" in z:
                    idx._ovf_scales = jnp.asarray(z["ovf_scales"])
        idx._n = meta["n"]
        idx.docid = meta.get("docid", [])
        return idx


class IVFRaggedIndex(IVFFlatIndex):
    """Ragged block-indirect IVF: the bulk-serving layout.

    The fixed-capacity layout (parent class) wastes ``capacity_factor - 1``
    of the corpus in padding and spills cluster skew into an always-scanned
    overflow slab — at 4 mixture components per cell that reached 20% of an
    8.8M corpus (hardware-measured).  Here rows sort by cell and each cell's
    segment pads only to a ``block`` multiple (~block/2 rows average waste
    per cell, ~3% at production shapes); the bulk kernel walks the padded
    block list with scalar-prefetched grid indirection
    (``ops/ivf_bulk.py:_ivf_ragged_topj``), so there is no capacity cap and
    no overflow slab at all.

    Shares training (device k-means + split-rebalance) and the bulk-search
    driver semantics (Qcap/hot-cell self-tuning) with the parent; the probe
    (legacy per-query) mode is not provided — use ``mode="bulk"`` (default)
    or ``mode="exact"``.
    """

    # [Qcap, block] fp32 scores + packed int32 copy VMEM budget for the bulk
    # kernel (see IVFFlatIndex._bulk_tiles); subclasses with extra scratch
    # (IVFPQIndex's decode buffers) lower it
    QCAP_ELEMS = 262144

    def __init__(self, dim: int, nlist: int = 1024, nprobe: int = 32,
                 dtype: str = "int8", block: int = 512,
                 train_block: int = 8192, qcap_factor: float = 2.0):
        super().__init__(dim, nlist=nlist, nprobe=nprobe, dtype=dtype,
                         train_block=train_block, qcap_factor=qcap_factor)
        self.block = block
        self._block_cell = None   # [nb_total] int32: owning cell per block
        self._block_start = None  # [nlist+1] int32: cell block ranges
        self._nb_max = 0

    # -- population ----------------------------------------------------------

    def add_device(self, reps) -> None:
        reps = jnp.asarray(reps)
        n = int(reps.shape[0])

        def chunk(s, r):
            part = reps[s:s + r]
            # full-range slices may alias `reps`; add_chunks CONSUMES chunks
            return jnp.array(part, copy=True) if part is reps else part

        self.add_chunks(chunk, n, chunk_rows=max(1, min(500_000, n)))

    def _assign_pass(self, chunk_fn, N: int, chunk_rows: int) -> np.ndarray:
        """Pass 1 of the two-pass build: nearest-centroid assignment, chunk
        at a time (each chunk CONSUMED; host work is the [N] int32 vector)."""
        assign_all = np.empty(N, np.int32)
        for start in range(0, N, chunk_rows):
            rows = min(chunk_rows, N - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            a = _assign_device(
                chunk.astype(jnp.float32) if chunk.dtype == jnp.bfloat16
                else chunk,
                self.centroids, min(8192, max(8, rows)))
            assign_all[start:start + rows] = np.asarray(a)
            chunk.delete()
        return assign_all

    def _ragged_layout(self, assign_all: np.ndarray, N: int):
        """Ragged padded-flat layout from the assignment vector: sets
        ``_nb_max``/``_block_cell``/``_block_start`` and returns
        ``(dest [N] int64 padded-flat position per row, row_ids_flat
        [nb_total*block] int32 with -1 in segment-tail padding)``."""
        block = self.block
        counts = np.bincount(assign_all, minlength=self.nlist)
        blocks_c = -(-counts // block)  # 0 blocks for empty cells
        block_start = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(blocks_c, out=block_start[1:])
        nb_total = int(block_start[-1])
        self._nb_max = int(max(1, blocks_c.max()))

        order = np.argsort(assign_all, kind="stable")
        sa = assign_all[order]
        row_start = block_start[:-1] * block  # row offset of each cell
        cum = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(counts, out=cum[1:])
        pos = np.arange(N, dtype=np.int64) - cum[sa]
        dest_sorted = row_start[sa] + pos
        dest = np.empty(N, np.int64)
        dest[order] = dest_sorted
        row_ids_flat = np.full(nb_total * block, -1, np.int32)
        row_ids_flat[dest_sorted] = order.astype(np.int32)
        self._block_cell = jnp.asarray(
            np.repeat(np.arange(self.nlist, dtype=np.int32), blocks_c))
        self._block_start = jnp.asarray(block_start.astype(np.int32))
        return dest, row_ids_flat

    def add_chunks(self, chunk_fn, n_rows: int,
                   chunk_rows: int = 500_000, assign=None) -> None:
        """Two-pass ragged build (see IVFFlatIndex.add_chunks for the chunk
        contract).  Every row lands in its cell's contiguous block range —
        no capacity cap, no overflow.

        ``assign``: optional precomputed [n_rows] int32 nearest-centroid
        assignment (the faiss "external coarse quantizer" pattern) — skips
        pass 1.  Must correspond to THESE centroids; callers caching it
        across processes must key the cache on the trained quantizer."""
        if not self.is_trained:
            raise RuntimeError("IVFRaggedIndex.add_chunks before train()")
        if self._values is not None:
            raise RuntimeError("IVFRaggedIndex build is one-shot")
        N = int(n_rows)
        block = self.block

        if assign is not None:
            assign_all = np.ascontiguousarray(np.asarray(assign, np.int32))
            assert assign_all.shape == (N,), assign_all.shape
        else:
            assign_all = self._assign_pass(chunk_fn, N, chunk_rows)
        self.last_assign = assign_all
        dest, row_ids_flat = self._ragged_layout(assign_all, N)
        nb_total = int(np.asarray(self._block_start)[-1])

        int8 = self.dtype == "int8"
        cell_dtype = (jnp.int8 if int8 else
                      jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32)
        values = jnp.zeros((nb_total * block, self.dim), cell_dtype)
        scales = jnp.ones((nb_total * block,), jnp.float32) if int8 else None

        @functools.partial(jax.jit, donate_argnums=(0,))
        def place(buf, rows_q, d):
            return buf.at[d].set(rows_q, mode="drop")

        if int8:
            from ..ops.quant import quantize_int8_device
        for start in range(0, N, chunk_rows):
            rows = min(chunk_rows, N - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            if int8:
                qv, qs = quantize_int8_device(
                    chunk.astype(jnp.float32) if chunk.dtype == jnp.bfloat16
                    else chunk,
                    block_rows=min(1024, rows))
            else:
                qv, qs = chunk.astype(cell_dtype), None
            if qv is not chunk:
                chunk.delete()
            d = jnp.asarray(dest[start:start + rows].astype(np.int32))
            values = place(values, qv, d)
            if qs is not None:
                scales = scales.at[d].set(qs, mode="drop")
            qv.delete()
            if qs is not None:
                qs.delete()
        self._values = values            # [nb_total*block, dim] padded-flat
        self._scales = scales
        self._row_ids = jnp.asarray(row_ids_flat)
        self._n = N
        self._search_fn = None
        self._bulk_state = None

    # -- search --------------------------------------------------------------

    def _side_slab(self, hot_ids: np.ndarray):
        """Hot cells' ACTUAL rows (block-range slices — no capacity padding
        inflates the slab), padded to the side kernel's block multiple."""
        if not hot_ids.size:
            return None, None, None, 0
        bs = np.asarray(self._block_start)
        parts_v, parts_s, parts_i = [], [], []
        for c in hot_ids:
            r0, r1 = int(bs[c]) * self.block, int(bs[c + 1]) * self.block
            if r1 > r0:
                parts_v.append(self._values[r0:r1])
                parts_i.append(self._row_ids[r0:r1])
                if self._scales is not None:
                    parts_s.append(self._scales[r0:r1])
        if not parts_v:
            return None, None, None, 0
        sv = jnp.concatenate(parts_v) if len(parts_v) > 1 else parts_v[0]
        si = jnp.concatenate(parts_i) if len(parts_i) > 1 else parts_i[0]
        ss = (jnp.concatenate(parts_s) if len(parts_s) > 1 else parts_s[0]) \
            if parts_s else None
        valid = np.asarray(si) >= 0
        order = np.argsort(~valid, kind="stable")
        sv, si = sv[jnp.asarray(order)], si[jnp.asarray(order)]
        if ss is not None:
            ss = ss[jnp.asarray(order)]
        n_valid = int(valid.sum())
        pad = (-sv.shape[0]) % self.SIDE_BLOCK
        if pad:
            sv = jnp.pad(sv, ((0, pad), (0, 0)))
            si = jnp.pad(si, (0, pad))
            if ss is not None:
                ss = jnp.pad(ss, (0, pad))
        return sv, ss, si, n_valid

    def _pad_queries(self, q_reps) -> Tuple[np.ndarray, int]:
        q = np.asarray(q_reps, np.float32)
        B0 = q.shape[0]
        pad = (-B0) % (256 if B0 > 256 else 8)
        if pad:
            q = np.concatenate([q, np.zeros((pad, self.dim), np.float32)])
        return q, B0

    def _bulk_call(self, q, k: int, nprobe: int, i8_native: bool,
                   state: dict, Qcap: int, n_real: int):
        """One kernel dispatch with an explicit tuning state; returns DEVICE
        (scores, doc_rows, n_dropped, probe_counts) — no host sync."""
        from ..ops.ivf_bulk import ivf_ragged_search, serve_j

        block = self.block
        mean_rows = max(block, int(self._n / max(1, self.nlist)))
        J = serve_j(k, block, mean_rows)
        if getattr(self, "bulk_j", None):
            J = min(self.bulk_j, k, block)
        sv, ss, si, side_valid = state["side"]
        hp = None
        if state["hot"].size:
            hp = jnp.zeros((self.nlist,), jnp.float32).at[
                jnp.asarray(state["hot"])].set(-jnp.inf)
        # cap effective nprobe at nlist - |hot| (see IVFFlatIndex)
        np_eff = min(nprobe, self.nlist - int(state["hot"].size))
        sb = self.SIDE_BLOCK
        side_J = serve_j(k, sb, max(sb, side_valid)) if side_valid else 4
        return ivf_ragged_search(
            jnp.asarray(q), self.centroids, self._values, self._row_ids,
            self._scales, self._block_cell, self._block_start,
            sv, ss, si,
            k=k, nprobe=np_eff, Qcap=Qcap, J=J, block=block,
            nlist=self.nlist, nb_max=self._nb_max, hot_penalty=hp,
            side_valid=side_valid, side_J=side_J, side_block=sb,
            i8_native=bool(i8_native and self._scales is not None),
            n_real=n_real)

    def search_bulk_async(self, q_reps, k: int = 100,
                          nprobe: Optional[int] = None,
                          i8_native: bool = False):
        """Dispatch-only bulk search against the CACHED tuned state: returns
        DEVICE (scores [B,k], doc_rows [B,k]) without any host sync, so a
        caller driving several devices (parallel/sharded_ivf.py) can put
        every shard's kernel in flight before the first result is read.
        Runs one ordinary (tuning) ``search_bulk`` first when no state is
        cached for this nprobe."""
        if self._values is None:
            raise RuntimeError("IVFRaggedIndex.search before add()")
        k = min(k, self._n)
        nprobe = self.nprobe if nprobe is None else min(nprobe, self.nlist)
        state = getattr(self, "_bulk_state", None)
        if state is None or state["key"] != (nprobe,) \
                or state["qcap"] is None:
            self.search_bulk(q_reps, k, nprobe=nprobe, i8_native=i8_native)
            state = self._bulk_state
        q, B0 = self._pad_queries(q_reps)
        tv, doc, dropped, _ = self._bulk_call(q, k, nprobe, i8_native, state,
                                              state["qcap"], B0)
        # DEVICE scalar, intentionally unsynced: callers refresh
        # ``last_dropped`` from it after their own sync point, so the drop
        # telemetry tracks the live query distribution, not the tuning batch
        self._last_dropped_dev = dropped
        return tv[:B0], doc[:B0]

    def search_bulk(self, q_reps: np.ndarray, k: int = 100,
                    nprobe: Optional[int] = None,
                    i8_native: bool = False
                    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._values is None:
            raise RuntimeError("IVFRaggedIndex.search before add()")
        k = min(k, self._n)
        nprobe = self.nprobe if nprobe is None else min(nprobe, self.nlist)
        q, B0 = self._pad_queries(q_reps)
        B = q.shape[0]
        block = self.block
        lam = B * nprobe / self.nlist
        qcap_cap = min(int(-(-B * nprobe // 8) * 8),
                       max(64, int(-(-4.0 * lam // 8) * 8)),
                       self.QCAP_ELEMS // block)
        state = getattr(self, "_bulk_state", None)
        if state is None or state["key"] != (nprobe,):
            hot = np.zeros((0,), np.int64)
            state = {"key": (nprobe,), "hot": hot,
                     "side": self._side_slab(hot), "qcap": None}
        Qcap = state["qcap"]
        if Qcap is None:
            Qcap = min(qcap_cap,
                       int(-(-max(8.0, self.qcap_factor * lam) // 8) * 8))

        while True:
            tv, doc, dropped, counts = self._bulk_call(
                q, k, nprobe, i8_native, state, Qcap, B0)
            self.last_dropped = int(dropped)
            if self.last_dropped <= max(8, int(0.001 * B * nprobe)):
                break
            counts_np = np.asarray(counts)
            hot_thresh = max(2.0 * lam, float(Qcap))
            overloaded = np.where(counts_np > hot_thresh)[0]
            new_hot = np.setdiff1d(overloaded, state["hot"])
            max_hot = self.max_hot if self.max_hot is not None \
                else max(1, self.nlist // 16)
            if new_hot.size and state["hot"].size < max_hot:
                new_hot = new_hot[np.argsort(-counts_np[new_hot])]
                room = max_hot - state["hot"].size
                state["hot"] = np.concatenate(
                    [state["hot"], new_hot[:room]]).astype(np.int64)
                state["side"] = self._side_slab(state["hot"])
                continue
            if Qcap >= qcap_cap:
                break
            Qcap = min(qcap_cap, Qcap * 2)
        state["qcap"] = Qcap
        self._bulk_state = state
        return np.asarray(tv)[:B0], np.asarray(doc)[:B0]

    def search(self, q_reps: np.ndarray, k: int = 100,
               mode: str = "bulk",
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        if self._values is None:
            raise RuntimeError("IVFRaggedIndex.search before add()")
        mode = resolve_ivf_mode(mode, self.dtype)
        k = min(k, self._n)
        q = np.asarray(q_reps, np.float32)
        if mode == "exact":
            return self._search_exact(q, k)
        # mode="i8q" (the "approx" alias on int8 cells): the native-int8 MXU
        # bulk kernels — same speed/recall point as FlatIPIndex mode="i8q".
        # The ragged layout has no separate per-query probe path, so "probe"
        # serves through the bulk kernel too (index/modes.py).
        return self.search_bulk(q, k, nprobe=nprobe,
                                i8_native=(mode == "i8q"))

    def _search_exact(self, q: np.ndarray, k: int):
        """Flat scan over every stored row (parity checks)."""
        mask = np.asarray(self._row_ids) >= 0
        flat_ids = np.asarray(self._row_ids)[mask]
        vals = np.asarray(self._values, np.float32)[mask]
        if self._scales is not None:
            vals = vals * np.asarray(self._scales)[mask][:, None]
        s, i = blockwise_topk(jnp.asarray(q), jnp.asarray(vals), k,
                              min(4096, vals.shape[0]))
        return np.asarray(s), np.asarray(flat_ids)[np.asarray(i)]

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "centroids": np.asarray(self.centroids, np.float32),
            "values": np.asarray(self._values),
            "row_ids": np.asarray(self._row_ids),
            "block_cell": np.asarray(self._block_cell),
            "block_start": np.asarray(self._block_start),
        }
        if self._scales is not None:
            payload["scales"] = np.asarray(self._scales)
        np.savez(path + ".npz", **payload)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"kind": "ivfr", "dim": self.dim, "nlist": self.nlist,
                       "nprobe": self.nprobe, "dtype": self.dtype,
                       "block": self.block, "nb_max": self._nb_max,
                       "n": self._n, "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str) -> "IVFRaggedIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(meta["dim"], nlist=meta["nlist"], nprobe=meta["nprobe"],
                  dtype=meta["dtype"], block=meta["block"])
        with np.load(path + ".npz") as z:
            idx.centroids = jnp.asarray(z["centroids"])
            idx._values = jnp.asarray(z["values"])
            idx._row_ids = jnp.asarray(z["row_ids"])
            idx._block_cell = jnp.asarray(z["block_cell"])
            idx._block_start = jnp.asarray(z["block_start"])
            if "scales" in z:
                idx._scales = jnp.asarray(z["scales"])
        idx._nb_max = meta["nb_max"]
        idx._n = meta["n"]
        idx.docid = meta.get("docid", [])
        return idx
