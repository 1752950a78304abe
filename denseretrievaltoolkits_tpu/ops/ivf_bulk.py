"""Cell-major bulk IVF search: MXU-form probe scoring for query batches.

Round-2's IVF probe search gathered each query's probed cells into a
per-query operand (``einsum("td,tpcd->tpc")``) — a batched matvec with no
shared operand, which runs at VPU rates (~54 GFLOP/s) and lost to the
brute-force MXU stream at every benched scale (VERDICT r2, weak #1).  This
module restructures the same work into real matmuls:

1. **probe**: one [B, nlist] centroid matmul; top-``nprobe`` cells per query;
2. **invert**: the (query, cell) incidence pairs are sorted by cell and
   scattered into a fixed-capacity per-cell query table ``[nlist, Qcap]``
   (static shapes — the TPU has no ragged tiling; overflow probes beyond
   Qcap are counted and dropped, like the cell build's overflow slab
   philosophy of spending bandwidth instead of correctness silently);
3. **score**: ONE Pallas kernel over grid (cell, cell_block).  Each step is a
   ``[Qcap, dim] x [dim, block]`` matmul — the query tile is the operand
   SHARED across the cell's rows, so the MXU streams cluster-major corpus
   blocks exactly like the flat serve kernel — followed by the packed 2-pass
   top-J selection (ops/topk.py) with flat cluster-major ids;
4. **merge**: per-(cell,slot) candidates → per-pair rows → per-query top-k,
   plus the exactly-scanned overflow slab.

Per-pair FLOPs are ``~capacity_factor × nprobe·C·dim`` — at 1M docs /
nlist=512 / nprobe=8 that is ~6% of the brute-force scan, at MXU rates.

The reference's trained-index search is ``faiss.index_factory`` + IVF probe
(``DRT/evaluator/index.py:47-54``); this is its bulk-serving TPU form.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import NEG_INF, _packed_select


def _cell_topj_kernel(qs_ref, c_ref, rid_ref, out_v_ref, out_i_ref, *,
                      J: int, block: int, nb: int, id_bits: int):
    """One (cell, cell-block) step over bf16/fp32 cells: shared-operand MXU
    matmul + packed top-J with flat cluster-major ids."""
    b = pl.program_id(0) * nb + pl.program_id(1)  # global block index
    q = qs_ref[0]                      # [Qcap, dim]
    c = c_ref[0].astype(q.dtype)       # [block, dim]
    s = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [Qcap, block]
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)  # empty capacity slots
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


def _cell_topj_kernel_scaled(qs_ref, c_ref, rid_ref, sc_ref, out_v_ref,
                             out_i_ref, *, J: int, block: int, nb: int,
                             id_bits: int):
    """int8-cell variant: in-kernel dequant-cast matmul + per-row scales."""
    b = pl.program_id(0) * nb + pl.program_id(1)
    q = qs_ref[0]
    c = c_ref[0].astype(q.dtype)
    s = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * sc_ref[0].reshape(1, -1)
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


@functools.partial(jax.jit, static_argnames=("J", "block"))
def _ivf_cell_topj(qslab, values, row_ids, scales, J: int, block: int,
                   qscales=None):
    """Grid (nlist, C/block); returns (vals, ids) [nlist*nb, Qcap, J] with
    ids flat in the cluster-major [nlist*C] layout.  ``qslab`` [nlist, Qcap,
    dim] holds each cell's probing queries (the shared matmul operand; the
    index map revisits the same block across a cell's inner steps, so it
    stays resident in VMEM while the cell rows stream)."""
    nlist, Qcap, dim = qslab.shape
    C = values.shape[1]
    nb = C // block
    id_bits = max(1, (block - 1).bit_length())
    common = dict(J=J, block=block, nb=nb, id_bits=id_bits)
    # 2D per-block vectors (row_ids, scales) flatten to [1, nlist*C]: Mosaic
    # requires a 2D block's second-to-last dim to divide 8 or equal the array
    # dim — a leading 1 satisfies it (same trick as the flat kernels' scales)
    in_specs = [
        pl.BlockSpec((1, Qcap, dim), lambda c, b: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block, dim), lambda c, b: (c, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block), lambda c, b: (0, c * nb + b),
                     memory_space=pltpu.VMEM),
    ]
    args = [qslab, values, row_ids.reshape(1, -1)]
    if qscales is not None:
        assert scales is not None, "i8-native cells require per-row scales"
        kernel = functools.partial(_cell_topj_kernel_i8q, **common)
        in_specs.append(pl.BlockSpec((1, block), lambda c, b: (0, c * nb + b),
                                     memory_space=pltpu.VMEM))
        # [nlist, 1, Qcap]: the (1, 1, Qcap) block equals the array dims, the
        # only shape Mosaic accepts for a per-cell row vector (hardware-
        # checked; a 2D (1, Qcap) block of [nlist, Qcap] is rejected)
        in_specs.append(pl.BlockSpec((1, 1, Qcap), lambda c, b: (c, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += [scales.reshape(1, -1), qscales.reshape(nlist, 1, Qcap)]
    elif scales is not None:
        kernel = functools.partial(_cell_topj_kernel_scaled, **common)
        in_specs.append(pl.BlockSpec((1, block), lambda c, b: (0, c * nb + b),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(1, -1))
    else:
        kernel = functools.partial(_cell_topj_kernel, **common)
    return pl.pallas_call(
        kernel,
        grid=(nlist, nb),
        in_specs=in_specs,
        out_specs=(
            # [nb_total, J, Qcap]: J in the second-to-last dim pads only to 8
            # (J in the lane dim padded to 128 — a 20x+ HBM/write blowup at
            # production shapes, hardware-observed)
            pl.BlockSpec((1, J, Qcap), lambda c, b: (c * nb + b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, Qcap), lambda c, b: (c * nb + b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nlist * nb, J, Qcap), jnp.float32),
            jax.ShapeDtypeStruct((nlist * nb, J, Qcap), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _cell_topj_kernel_i8q(qs_ref, c_ref, rid_ref, sc_ref, qsc_ref, out_v_ref,
                          out_i_ref, *, J: int, block: int, nb: int,
                          id_bits: int):
    """Native-int8 cell variant: int8 query slab x int8 cells through the
    MXU's s8·s8→s32 mode (the same 1.41x-over-cast mode measured for the flat
    serve kernel, ops/topk.py:_block_topj_kernel_packed_i8q); dequant is one
    fp32 multiply by per-row cell scales x per-slot query scales."""
    b = pl.program_id(0) * nb + pl.program_id(1)
    q = qs_ref[0]                      # [Qcap, dim] int8
    c = c_ref[0]                       # [block, dim] int8
    s32 = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s32.astype(jnp.float32) * sc_ref[0].reshape(1, -1) \
        * qsc_ref[0].reshape(-1, 1)
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


def _ragged_kernel(cellof_ref, qs_ref, c_ref, rid_ref, out_v_ref, out_i_ref,
                   *, J: int, block: int, id_bits: int):
    """One RAGGED block step (bf16/fp32 cells): the grid walks the padded-
    flat block list; ``cellof_ref`` (scalar-prefetched) tells the index maps
    which cell's query tile to keep resident.  Ids are flat positions in the
    padded layout."""
    b = pl.program_id(0)
    q = qs_ref[0]                      # [Qcap, dim]
    c = c_ref[:]                       # [block, dim]
    s = jax.lax.dot_general(
        q, c.astype(q.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)  # segment-tail padding
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


def _ragged_kernel_scaled(cellof_ref, qs_ref, c_ref, rid_ref, sc_ref,
                          out_v_ref, out_i_ref, *, J: int, block: int,
                          id_bits: int):
    """int8-cell ragged variant: fused dequant scales."""
    b = pl.program_id(0)
    q = qs_ref[0]
    c = c_ref[:]
    s = jax.lax.dot_general(
        q, c.astype(q.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * sc_ref[0].reshape(1, -1)
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


def _ragged_kernel_i8q(cellof_ref, qs_ref, c_ref, rid_ref, sc_ref, qsc_ref,
                       out_v_ref, out_i_ref, *, J: int, block: int,
                       id_bits: int):
    """Native-int8 ragged variant: s8·s8→s32 MXU matmul + one fp32 dequant
    multiply (per-row cell scales x per-slot query scales)."""
    b = pl.program_id(0)
    q = qs_ref[0]                      # [Qcap, dim] int8
    c = c_ref[:]                       # [block, dim] int8
    s32 = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s32.astype(jnp.float32) * sc_ref[0].reshape(1, -1) \
        * qsc_ref[0].reshape(-1, 1)
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


@functools.partial(jax.jit, static_argnames=("J", "block"))
def _ivf_ragged_topj(block_cell, qslab, values, row_ids, scales,
                     J: int, block: int, qscales=None):
    """Ragged cell scoring: grid (nb_total,) over the padded-flat block list
    ([nb_total*block, dim] values, cells occupying contiguous block ranges).
    ``block_cell`` [nb_total] int32 is scalar-prefetched so the Qslab index
    map can follow the cell of each block — TPU gather-by-grid-indirection.
    Returns (vals, ids) [nb_total, J, Qcap], ids flat in the padded layout."""
    nlist, Qcap, dim = qslab.shape
    nb_total = block_cell.shape[0]
    id_bits = max(1, (block - 1).bit_length())
    common = dict(J=J, block=block, id_bits=id_bits)
    in_specs = [
        pl.BlockSpec((1, Qcap, dim), lambda b, cellof: (cellof[b], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, dim), lambda b, cellof: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block), lambda b, cellof: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    args = [qslab, values, row_ids.reshape(1, -1)]
    if qscales is not None:
        assert scales is not None, "i8-native cells require per-row scales"
        kernel = functools.partial(_ragged_kernel_i8q, **common)
        in_specs.append(pl.BlockSpec((1, block), lambda b, cellof: (0, b),
                                     memory_space=pltpu.VMEM))
        # [nlist, 1, Qcap] (see _ivf_cell_topj: the only Mosaic-accepted
        # block shape for a per-cell row vector)
        in_specs.append(pl.BlockSpec((1, 1, Qcap),
                                     lambda b, cellof: (cellof[b], 0, 0),
                                     memory_space=pltpu.VMEM))
        args += [scales.reshape(1, -1), qscales.reshape(nlist, 1, Qcap)]
    elif scales is not None:
        kernel = functools.partial(_ragged_kernel_scaled, **common)
        in_specs.append(pl.BlockSpec((1, block), lambda b, cellof: (0, b),
                                     memory_space=pltpu.VMEM))
        args.append(scales.reshape(1, -1))
    else:
        kernel = functools.partial(_ragged_kernel, **common)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_total,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, J, Qcap), lambda b, cellof: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, Qcap), lambda b, cellof: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb_total, J, Qcap), jnp.float32),
            jax.ShapeDtypeStruct((nb_total, J, Qcap), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(block_cell, *args)


def invert_probe_pairs(cells, B: int, nprobe: int, nlist: int, Qcap: int,
                       n_real):
    """Invert (query, cell) probe pairs into the fixed-capacity per-cell
    query table — the shared step-2 of every bulk search (module docstring).

    Rank-major slotting inside each cell: a hot cell's Qcap slots fill with
    the pairs for which it is the TOP-ranked probe first, so capacity drops
    land on low-ranked (least important) probes and recall degrades
    gracefully under query-locality hot spots.  Padding queries (rows
    >= ``n_real``, a TRACED operand) sort after every real rank and go
    straight to the drop bucket — an all-zero padding query scores every
    cell 0.0, so its rank-0 probes would otherwise evict real queries'
    rank-1+ probes from cells 0..nprobe-1 (advisor r3, medium).

    Returns ``(qtab [nlist*Qcap] int32, dest [P] int32, sc [P], slot [P],
    in_cap [P] bool, order [P], counts [nlist], n_dropped scalar)`` where
    pair arrays are in (cell, rank)-sorted order and ``order`` maps sorted
    position -> original pair index."""
    P = B * nprobe
    pair_cell = cells.reshape(-1)
    pair_q = jnp.repeat(jnp.arange(B, dtype=jnp.int32), nprobe)
    pair_rank = jnp.tile(jnp.arange(nprobe, dtype=jnp.int32), B)
    real = pair_q < n_real  # traced mask; all-true when the batch is unpadded
    rank_key = jnp.where(real, pair_rank, nprobe)
    counts_all = jnp.zeros((nlist,), jnp.int32).at[pair_cell].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_all)[:-1]])
    order = jnp.argsort(pair_cell * (nprobe + 1) + rank_key)  # stable
    sc = pair_cell[order]
    slot = jnp.arange(P, dtype=jnp.int32) - starts[sc]
    qidx = pair_q[order]
    real_s = real[order]
    in_cap = (slot < Qcap) & real_s
    counts = jnp.zeros((nlist,), jnp.int32).at[pair_cell].add(
        real.astype(jnp.int32))
    n_dropped = jnp.sum(real_s & ~in_cap)
    dest = jnp.where(in_cap, sc * Qcap + slot, nlist * Qcap)  # OOB -> dropped
    qtab = jnp.zeros((nlist * Qcap,), jnp.int32).at[dest].set(
        qidx, mode="drop")
    return qtab, dest, sc, slot, in_cap, order, counts, n_dropped


def serve_j(k: int, block: int, C: int) -> int:
    """Per-block candidate density: a query's top-k members inside ONE probed
    cell spread ~uniformly over the cell's blocks (within-cell row order is
    corpus order), so per-block hits are ~Poisson(k·block/C); mean + 4·sqrt +
    4 slots bounds the per-block overflow at ~1e-6.  Clamped so a single
    cell can still represent a full top-k (nb·J >= k whenever C >= k)."""
    nb = max(1, C // block)
    lam = k * block / max(block, C)
    J = int(np.ceil(lam + 4.0 * np.sqrt(lam) + 4.0))
    J = max(J, -(-k // nb))
    return min(J, k, block)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "Qcap", "J", "block", "nlist", "C",
                     "side_valid", "side_J", "side_block", "i8_native"))
def ivf_bulk_search(q, centroids, values, row_ids, scales,
                    side_values, side_scales, side_ids,
                    k: int, nprobe: int, Qcap: int, J: int, block: int,
                    nlist: int, C: int,
                    hot_penalty=None, side_valid: int = 0,
                    side_J: int = 4, side_block: int = 1024,
                    i8_native: bool = False, n_real=None):
    """Fully-jitted cell-major bulk search.

    q [B, dim] fp32; values [nlist, C, dim] (bf16/fp32/int8 + scales);
    row_ids [nlist, C] int32 (-1 = empty slot).

    ``side_*``: the dense SIDE-SCAN slab — overflow rows plus the rows of
    "hot" cells (IP-metric probing concentrates every query on large-norm
    centroids, so a few cells attract far more probes than any per-cell
    query capacity can hold; those cells are excluded from probing via
    ``hot_penalty`` [nlist] and instead scanned exactly by EVERY query with
    the flat packed kernel — a shared-operand matmul, which is exactly what
    a cell probed by everyone wants to be).

    Returns (scores [B, k], doc_rows [B, k] int32, n_dropped scalar,
    probe_counts [nlist] int32) — n_dropped counts REAL probe pairs beyond
    Qcap (the telemetry the caller's Qcap/hot-set auto-tuning consumes).

    ``n_real``: number of real (non-padding) queries; rows [n_real, B) are
    batch padding whose probe pairs are excluded from slotting, counts and
    n_dropped — an all-zero padding query scores every cell 0.0, so its
    rank-0 probes of cells 0..nprobe-1 would otherwise outrank real queries'
    rank-1+ probes and evict them from those cells' Qcap tables (advisor r3,
    medium).  TRACED operand (not a static argname: every distinct raw
    batch size would otherwise force a recompile, defeating the callers'
    8/256 padding buckets); None means every query is real."""
    B, dim = q.shape
    P = B * nprobe
    if n_real is None:
        n_real = B

    # 1) probe (one MXU matmul) — inner-product cell ranking, faiss IVF-IP
    cell_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    if hot_penalty is not None:
        cell_scores = cell_scores + hot_penalty[None, :]
    _, cells = jax.lax.top_k(cell_scores, nprobe)             # [B, nprobe]

    # 2) invert to cell-major (rank-major slotting, padding-pair exclusion;
    # see invert_probe_pairs)
    qtab, _, sc, slot, in_cap, order, counts, n_dropped = invert_probe_pairs(
        cells, B, nprobe, nlist, Qcap, n_real)

    # 3) shared-operand scoring: gather the query slab, run the cell kernel.
    # i8_native (int8 cells only): queries quantize to int8 once, the slab
    # gathers int8 rows + per-slot scales, and the matmuls run in the MXU's
    # s8·s8→s32 mode (measured 1.41x over the cast-to-bf16 twin at the flat
    # serve kernel's production shapes)
    qc = q.astype(jnp.bfloat16 if values.dtype != jnp.float32 else jnp.float32)
    qi = qsq = None
    if i8_native:
        from .topk import quantize_queries

        qi, qsq = quantize_queries(q)
        qslab = qi[qtab].reshape(nlist, Qcap, dim)
        qscale_slab = qsq[qtab].reshape(nlist, Qcap)
        vals_b, ids_b = _ivf_cell_topj(qslab, values, row_ids, scales, J,
                                       block, qscales=qscale_slab)
    else:
        qslab = qc[qtab].reshape(nlist, Qcap, dim)
        vals_b, ids_b = _ivf_cell_topj(qslab, values, row_ids, scales, J,
                                       block)

    # 4a) per-(cell,slot): merge the cell's blocks ([nb_total, J, Qcap] out)
    nb = C // block
    v = vals_b.reshape(nlist, nb, J, Qcap).transpose(0, 3, 1, 2)
    i = ids_b.reshape(nlist, nb, J, Qcap).transpose(0, 3, 1, 2)
    kp = min(k, nb * J)
    cv, cpos = jax.lax.top_k(v.reshape(nlist * Qcap, nb * J), kp)
    ci = jnp.take_along_axis(i.reshape(nlist * Qcap, nb * J), cpos, axis=1)

    # 4b) per-pair rows (dropped pairs contribute -inf), back to query order
    pr = jnp.where(in_cap, sc * Qcap + slot, 0)
    pv = jnp.where(in_cap[:, None], cv[pr], -jnp.inf)
    pi = ci[pr]
    inv = jnp.argsort(order)
    pv = pv[inv].reshape(B, nprobe * kp)
    pi = pi[inv].reshape(B, nprobe * kp)

    # 4c) per-query top-k; flat cluster-major positions -> corpus row ids
    kk = min(k, nprobe * kp)
    tv, tpos = jax.lax.top_k(pv, kk)
    ti = jnp.take_along_axis(pi, tpos, axis=1)
    doc = row_ids.reshape(-1)[ti]

    # 5) dense side-scan (overflow rows + hot cells)
    tv, doc = _side_scan(qc, tv, doc, side_values, side_scales, side_ids,
                         k, side_valid, side_J, side_block, qi=qi, qs=qsq)
    # queries with fewer than k finite candidates: the -inf tail slots carry
    # junk ids (masked/dropped positions resolve through row_ids[0]'s cell) —
    # clamp them to the -1 sentinel so callers can filter before docid
    # translation (advisor r3; faiss returns -1 labels in the same case)
    doc = jnp.where(tv > NEG_INF / 2, doc, -1)
    return tv, doc, n_dropped, counts


def _side_scan(qc, tv, doc, side_values, side_scales, side_ids,
               k: int, side_valid: int, side_J: int, side_block: int,
               qi=None, qs=None):
    """Dense side-scan slab (overflow rows + hot cells): the flat packed
    kernel over the slab — every query scores it, candidates merge at the
    slab's own k.  With ``qi``/``qs`` (int8 queries + scales) and int8 slab
    values, the scan runs in the MXU's native-int8 mode."""
    if side_valid <= 0:
        return tv, doc
    from .topk import (_pallas_block_topj_packed,
                       _pallas_block_topj_packed_i8q,
                       _pallas_block_topj_packed_scaled)

    B = qc.shape[0]
    if side_scales is not None and qi is not None:
        sv_b, si_b = _pallas_block_topj_packed_i8q(
            qi, side_values, side_scales, qs, side_J, side_block, side_valid)
    elif side_scales is not None:
        sv_b, si_b = _pallas_block_topj_packed_scaled(
            qc, side_values, side_scales, side_J, side_block, side_valid)
    else:
        sv_b, si_b = _pallas_block_topj_packed(
            qc, side_values, side_J, side_block, side_valid)
    nbs = sv_b.shape[0]
    flat_v = jnp.transpose(sv_b, (2, 0, 1)).reshape(B, nbs * side_J)
    flat_i = jnp.transpose(si_b, (2, 0, 1)).reshape(B, nbs * side_J)
    k2 = min(k, nbs * side_J, side_valid)
    so_top, so_pos = jax.lax.top_k(flat_v, k2)
    so_doc = jnp.take(side_ids, jnp.take_along_axis(flat_i, so_pos, axis=1))
    all_v = jnp.concatenate([tv, so_top], axis=1)
    all_d = jnp.concatenate([doc, so_doc], axis=1)
    tv, pos2 = jax.lax.top_k(all_v, min(k, all_v.shape[1]))
    doc = jnp.take_along_axis(all_d, pos2, axis=1)
    return tv, doc


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "Qcap", "J", "block", "nlist", "nb_max",
                     "side_valid", "side_J", "side_block", "i8_native"))
def ivf_ragged_search(q, centroids, values, row_ids, scales,
                      block_cell, block_start,
                      side_values, side_scales, side_ids,
                      k: int, nprobe: int, Qcap: int, J: int, block: int,
                      nlist: int, nb_max: int,
                      hot_penalty=None, side_valid: int = 0,
                      side_J: int = 4, side_block: int = 512,
                      i8_native: bool = False, n_real=None):
    """Cell-major bulk search over the RAGGED block-indirect layout.

    ``values`` [nb_total*block, dim]: rows sorted by cell, each cell padded
    only to a block multiple (~block/2 rows average waste per cell — the
    fixed-capacity layout wastes capacity_factor-1 x the corpus and spills
    skew into an always-scanned overflow slab; at 4 mixture components per
    cell that was 20%+ of the corpus).  ``block_cell`` [nb_total] maps each
    block to its cell (scalar-prefetched grid indirection);
    ``block_start`` [nlist+1] gives each cell's block range; ``nb_max`` is
    the largest per-cell block count (static pad for the candidate gather).

    Same probe/invert/Qcap/hot-cell/``n_real`` semantics as
    :func:`ivf_bulk_search`; returns the same (scores, doc_rows, n_dropped,
    probe_counts)."""
    B, dim = q.shape
    P = B * nprobe
    if n_real is None:
        n_real = B

    cell_scores = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    if hot_penalty is not None:
        cell_scores = cell_scores + hot_penalty[None, :]
    _, cells = jax.lax.top_k(cell_scores, nprobe)

    # invert to cell-major (rank-major slotting, padding-pair exclusion;
    # see invert_probe_pairs)
    qtab, _, sc, slot, in_cap, order, counts, n_dropped = invert_probe_pairs(
        cells, B, nprobe, nlist, Qcap, n_real)

    qc = q.astype(jnp.bfloat16 if values.dtype != jnp.float32 else jnp.float32)
    qi = qsq = None
    if i8_native:
        from .topk import quantize_queries

        qi, qsq = quantize_queries(q)
        qslab = qi[qtab].reshape(nlist, Qcap, dim)
        qscale_slab = qsq[qtab].reshape(nlist, Qcap)
        vals_b, ids_b = _ivf_ragged_topj(block_cell, qslab, values, row_ids,
                                         scales, J, block,
                                         qscales=qscale_slab)
    else:
        qslab = qc[qtab].reshape(nlist, Qcap, dim)
        vals_b, ids_b = _ivf_ragged_topj(block_cell, qslab, values, row_ids,
                                         scales, J, block)  # [nb_total, J, Qcap]

    # per-pair candidate gather over the pair's cell block RANGE
    nb_total = vals_b.shape[0]
    prange = block_start[sc][:, None] + jnp.arange(nb_max,
                                                   dtype=jnp.int32)[None, :]
    bvalid = prange < block_start[sc + 1][:, None]          # [P, nb_max]
    prc = jnp.clip(prange, 0, nb_total - 1)
    slot_c = jnp.clip(slot, 0, Qcap - 1)
    jidx = jnp.arange(J, dtype=jnp.int32)
    pv = vals_b[prc[:, :, None], jidx[None, None, :], slot_c[:, None, None]]
    pi = ids_b[prc[:, :, None], jidx[None, None, :], slot_c[:, None, None]]
    keep = bvalid[:, :, None] & in_cap[:, None, None]
    pv = jnp.where(keep, pv, -jnp.inf).reshape(P, nb_max * J)
    pi = pi.reshape(P, nb_max * J)
    kp = min(k, nb_max * J)
    cv, cpos = jax.lax.top_k(pv, kp)
    ci = jnp.take_along_axis(pi, cpos, axis=1)

    inv = jnp.argsort(order)
    pv2 = cv[inv].reshape(B, nprobe * kp)
    pi2 = ci[inv].reshape(B, nprobe * kp)
    kk = min(k, nprobe * kp)
    tv, tpos = jax.lax.top_k(pv2, kk)
    ti = jnp.take_along_axis(pi2, tpos, axis=1)
    doc = row_ids.reshape(-1)[ti]

    tv, doc = _side_scan(qc, tv, doc, side_values, side_scales, side_ids,
                         k, side_valid, side_J, side_block, qi=qi, qs=qsq)
    doc = jnp.where(tv > NEG_INF / 2, doc, -1)  # sentinel, see ivf_bulk_search
    return tv, doc, n_dropped, counts
