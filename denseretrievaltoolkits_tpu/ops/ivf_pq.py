"""Cell-major bulk IVF-PQ search: probe-pruned fused decode-and-scan.

Composes the two trained-index engines this framework already serves —
the ragged cell-major bulk IVF (``ops/ivf_bulk.py``) and the PQ
decode-and-scan kernel (``ops/pq.py``) — into the FAISS factory surface's
canonical large-scale family ``IVF{n},PQ{M}`` (the reference routes such
strings through ``faiss.index_factory``, ``DRT/evaluator/index.py:47-54``).

Why the composition pays on TPU (and for which family): the PQ serve
kernel's decode is per-ROW work shared across the query tile, so at a flat
scan's serving batches (256-2048 queries) decode amortizes to ~2x (8-bit)
or ~20% (4-bit) of the scan matmul.  Inside a probed cell the shared
operand is the cell's Qcap query table (8-64 queries), so the 8-bit
decode (256 one-hot columns/subspace) dominates the cell scan — but the
4-bit family (16 columns/subspace) decodes at roughly the cost of scanning
16 queries, and the probe prunes the SCAN to ``nprobe/nlist`` of the
corpus.  Net: ``IVF{n},PQ{M}x4`` keeps PQ's 96 B/row capacity and cuts
serve cost by several x at bulk batches (measured in BASELINE.md).

Residual encoding (FAISS IVFPQ's ``by_residual=True`` default): each row
stores codes for ``x - centroid(cell)``; the search adds the probe matmul's
``q . centroid`` back per (cell, slot) inside the kernel, so scores are
``q . (centroid + decode(code))`` — ADC against the reconstruction, with
the residual's much smaller variance giving the codebooks an easier fit.

Pipeline (shared steps live in ops/ivf_bulk.py):

1. **probe**: one [B, nlist] centroid matmul (raw scores kept for the
   residual offsets); top-``nprobe`` cells per query;
2. **invert**: ``invert_probe_pairs`` — the fixed-capacity per-cell query
   table, rank-major slotting, padding-pair exclusion;
3. **score**: ONE Pallas kernel over the ragged padded-flat block list
   (scalar-prefetched cell indirection).  Each step decodes its code block
   in VMEM via block-diagonal one-hot MXU matmuls (never writing the
   reconstruction to HBM), scores it against the cell's query tile, adds
   the per-slot probe offsets, and runs the packed top-J selection;
4. **merge**: per-pair candidates over the cell's block range -> per-query
   top-k, plus the dense int8 side-scan of hot cells (hot cells' rows are
   DECODED once to reconstructions and int8-quantized at slab build, so
   side scores match the cell path's reconstruction contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ivf_bulk import _side_scan, invert_probe_pairs
from .pq import _PQ_SUB
from .topk import NEG_INF, _packed_select


def _ragged_pq_kernel(cellof_ref, qs_ref, codes_ref, rid_ref, poff_ref,
                      bdcb_hbm, out_v_ref, out_i_ref,
                      decoded_ref, onehot_ref, bdcb_vmem, dma_sem, *,
                      J: int, block: int, id_bits: int, nbits: int):
    """One RAGGED block step over PQ cells: in-kernel decode (8-bit centered
    codes or 4-bit nibble-packed — the ops/pq.py serve-kernel idioms), one
    [Qcap, H] x [H, block] scoring matmul, per-slot residual offsets, packed
    top-J.  The block-diagonal codebook DMAs HBM->VMEM once at the first
    grid step (grid-invariant; a pipelined BlockSpec would double-buffer
    it)."""
    b = pl.program_id(0)
    TN = block
    n_groups = bdcb_vmem.shape[0]
    GK = bdcb_vmem.shape[2]
    kcb = 16 if nbits == 4 else 256
    G = GK // kcb                     # subspaces per 128-dim output group
    SUB = min(GK, _PQ_SUB)            # one-hot sub-tile rows (VMEM bound)
    n_sub = GK // SUB
    G_sub = SUB // kcb

    @pl.when(b == 0)
    def _():
        dma = pltpu.make_async_copy(bdcb_hbm, bdcb_vmem, dma_sem)
        dma.start()
        dma.wait()

    # decode this code block to its reconstruction (residual space) —
    # hoisted int32 iota + compare per sub-tile (Mosaic has no sub-32-bit
    # compare on this target; see ops/pq.py:_pq_serve_kernel)
    shift = 0 if nbits == 4 else 128
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (kcb, TN), 0) - shift
    for g in range(n_groups):
        acc = jnp.zeros((128, TN), jnp.float32)
        for j in range(n_sub):
            m0 = g * G + j * G_sub
            if nbits == 4:
                v = codes_ref[m0 // 2:m0 // 2 + G_sub // 2, :].astype(
                    jnp.int32) & 255
                # subspace 2i low nibble, 2i+1 high (pq4_unpack layout)
                code32 = jnp.stack([v & 15, v >> 4], axis=1).reshape(
                    G_sub, TN)
            else:
                code32 = codes_ref[m0:m0 + G_sub, :].astype(jnp.int32)
            oh = (iota_c[None] == code32[:, None, :]).astype(jnp.bfloat16)
            onehot_ref[:] = oh.reshape(SUB, TN)
            acc = acc + jax.lax.dot_general(
                bdcb_vmem[g, :, j * SUB:(j + 1) * SUB], onehot_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        decoded_ref[g * 128:(g + 1) * 128, :] = acc.astype(jnp.bfloat16)

    q = qs_ref[0]                      # [Qcap, dim] bf16
    s = jax.lax.dot_general(
        q, decoded_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [Qcap, block]
    # residual offsets: q . centroid(cell) per (cell, slot), from the probe
    s = s + poff_ref[0, 0, :].reshape(-1, 1)
    rid = rid_ref[0].reshape(1, -1)
    s = jnp.where(rid >= 0, s, NEG_INF)  # segment-tail padding
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block,
                   n_valid=2**31 - 1, id_bits=id_bits)


@functools.partial(jax.jit, static_argnames=("J", "block", "nbits"))
def _ivf_ragged_topj_pq(block_cell, qslab, codes, row_ids, poff, bdcb,
                        J: int, block: int, nbits: int):
    """PQ-cell scoring over the ragged padded-flat block list: grid
    (nb_total,), scalar-prefetched cell indirection for the query tile and
    the per-slot probe offsets.  ``codes`` [M_storage, nb_total*block]
    CODE-MAJOR int8 (column n = padded position n's codes; -128-centered
    8-bit or nibble-packed 4-bit); ``poff`` [nlist, 1, Qcap] fp32 raw probe
    scores.  Returns (vals, ids) [nb_total, J, Qcap], ids flat in the
    padded layout."""
    nlist, Qcap, dim = qslab.shape
    nb_total = block_cell.shape[0]
    m_storage = codes.shape[0]
    n_groups, _, GK = bdcb.shape
    id_bits = max(1, (block - 1).bit_length())
    kernel = functools.partial(_ragged_pq_kernel, J=J, block=block,
                               id_bits=id_bits, nbits=nbits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb_total,),
        in_specs=[
            pl.BlockSpec((1, Qcap, dim), lambda b, cellof: (cellof[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_storage, block), lambda b, cellof: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda b, cellof: (0, b),
                         memory_space=pltpu.VMEM),
            # [nlist, 1, Qcap]: the only Mosaic-accepted block shape for a
            # per-cell row vector (see ops/ivf_bulk.py:_ivf_cell_topj)
            pl.BlockSpec((1, 1, Qcap), lambda b, cellof: (cellof[b], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # bdcb stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((1, J, Qcap), lambda b, cellof: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, Qcap), lambda b, cellof: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((dim, block), jnp.bfloat16),             # decoded
            pltpu.VMEM((min(GK, _PQ_SUB), block), jnp.bfloat16),  # onehot
            pltpu.VMEM((n_groups, 128, GK), jnp.bfloat16),      # bdcb
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb_total, J, Qcap), jnp.float32),
            jax.ShapeDtypeStruct((nb_total, J, Qcap), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(block_cell, qslab, codes, row_ids.reshape(1, -1), poff, bdcb)


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "Qcap", "J", "block", "nlist", "nb_max",
                     "side_valid", "side_J", "side_block", "nbits"))
def ivf_pq_search(q, centroids, codes, row_ids, block_cell, block_start,
                  bdcb, side_values, side_scales, side_ids,
                  k: int, nprobe: int, Qcap: int, J: int, block: int,
                  nlist: int, nb_max: int,
                  hot_penalty=None, side_valid: int = 0,
                  side_J: int = 4, side_block: int = 512,
                  nbits: int = 8, n_real=None):
    """Fully-jitted bulk IVF-PQ search (module docstring pipeline).

    Same probe/invert/Qcap/hot-cell/``n_real`` semantics and return contract
    as ``ops/ivf_bulk.py:ivf_ragged_search`` — (scores [B, k], doc_rows
    [B, k] int32 with -1 sentinels, n_dropped, probe_counts) — but cells
    store PQ codes and scores are reconstruction ADC (residual decode + the
    probe's ``q . centroid`` offset)."""
    B, dim = q.shape
    if n_real is None:
        n_real = B

    # 1) probe — RAW scores kept: they double as the residual offsets
    raw = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    sel = raw if hot_penalty is None else raw + hot_penalty[None, :]
    _, cells = jax.lax.top_k(sel, nprobe)                     # [B, nprobe]

    # 2) invert to cell-major
    qtab, dest, sc, slot, in_cap, order, counts, n_dropped = \
        invert_probe_pairs(cells, B, nprobe, nlist, Qcap, n_real)

    # per-(cell, slot) residual offsets: the pair's raw probe score
    raw_pair = jnp.take_along_axis(raw, cells, axis=1).reshape(-1)
    ptab = jnp.zeros((nlist * Qcap,), jnp.float32).at[dest].set(
        raw_pair[order], mode="drop")
    poff = ptab.reshape(nlist, 1, Qcap)

    # 3) decode-and-scan over the ragged block list
    qc = q.astype(jnp.bfloat16)
    qslab = qc[qtab].reshape(nlist, Qcap, dim)
    vals_b, ids_b = _ivf_ragged_topj_pq(block_cell, qslab, codes, row_ids,
                                        poff, bdcb, J, block, nbits)

    # 4) per-pair candidate gather over the pair's cell block RANGE
    # (identical merge to ivf_ragged_search)
    P = B * nprobe
    nb_total = vals_b.shape[0]
    prange = block_start[sc][:, None] + jnp.arange(nb_max,
                                                   dtype=jnp.int32)[None, :]
    bvalid = prange < block_start[sc + 1][:, None]            # [P, nb_max]
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

    # 5) dense side-scan of hot cells (int8 reconstructions — absolute
    # scores, same contract as the cell path's centroid + residual)
    tv, doc = _side_scan(qc, tv, doc, side_values, side_scales, side_ids,
                         k, side_valid, side_J, side_block)
    doc = jnp.where(tv > NEG_INF / 2, doc, -1)  # sentinel (advisor r3)
    return tv, doc, n_dropped, counts
