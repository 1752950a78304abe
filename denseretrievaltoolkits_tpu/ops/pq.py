"""Product-quantization ops: training, encoding, and fused decode-and-scan search.

This is the TPU-native answer to the PQ leg of FAISS's ``index_factory``
surface (``/root/reference/DRT/evaluator/index.py:47-54`` accepts arbitrary
factory strings incl. "PQ96", "OPQ96,PQ96").  Rounds 1-3 deliberately rejected
PQ (PARITY.md): classic ADC is a per-code LUT *gather*, which the TPU cannot
do fast, and reformulating the gather as a one-hot matmul over the full
``M*256`` LUT axis costs 32x the dense scan it replaces.

The design here side-steps ADC instead of porting it: **decode-and-scan**.
Corpus codes stream HBM->VMEM one block at a time; each block is decoded to
its reconstruction INSIDE the kernel (one-hot matmuls against a block-diagonal
codebook — the MXU-native "gather") and immediately scored with a dense
[TQ, H] x [H, TN] matmul, so the reconstruction never touches HBM.  Decode
work is ``256 x H`` MACs per row *independent of the query count*, so at
serving batch sizes (Q >= 1k) it amortizes to ~2x the scan matmul (the
one-hot matmul keeps full MXU tiles but carries a 128/d_sub redundancy);
classic ADC would instead pay ``M*256`` MACs per (query, row) pair — 32x the
scan, at every batch size.

What PQ buys on TPU is *capacity*, not speed: at M=96 subquantizers a 768-dim
corpus stores at 96 B/row — 4x beyond nibble-packed SQ4 (384 B + scale), i.e.
~160M rows in a 16 GB v5e chip vs ~42M for SQ4 and ~21M for SQ8.

Layouts (all chosen so jax's (32, 128) int8 HBM tiling pads nothing at M=96):

- codes:      [M, N] int8, CODE-MAJOR, value = c - 128 ("centered" so the
              0..255 code id fits int8); column n holds row n's M codes.
- codebooks:  [M, 256, d_sub] fp32 (d_sub = H / M); ~768 KB at H=768 — the
              codebook always fits VMEM.
- bdcb:       [n_groups, 128, G*256] bf16 block-diagonal expansion of the
              codebooks (G = 128 // d_sub subspaces per group, n_groups =
              H // 128): row ``ml*d_sub + d``, col ``ml*256 + c`` holds
              ``codebooks[g*G + ml, c, d]``.  One [128, G*256] @ [G*256, TN]
              matmul decodes 128 output dims of a whole corpus block with
              full MXU tiles.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import _packed_select

K = 256  # centroids per subquantizer (8-bit codes; the FAISS PQ{M} default)
_PQ_SUB = 1024  # one-hot sub-tile rows: bounds the decode scratch + temporaries


# ---------------------------------------------------------------------------
# training: M independent 256-centroid k-means, batched over subspaces
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _kmeans_step(x_sub: jax.Array, cb: jax.Array, block_rows: int):
    """One Lloyd iteration for all M subspace k-means at once.

    x_sub [M, n, d] sample split by subspace; cb [M, K, d].  Returns
    (new_cb, counts [M, K]).  Assignment is the L2 argmin via the IP trick
    (argmax x.c - |c|^2/2); the update accumulates one-hot sums blockwise so
    peak memory is one [M, block_rows, K] one-hot."""
    M, n, d = x_sub.shape
    k_cb = cb.shape[1]
    half_norm = 0.5 * jnp.sum(cb * cb, axis=2)  # [M, K]

    def body(carry, xb):  # xb [M, block_rows, d]
        sums, counts = carry
        scores = jnp.einsum("mbd,mkd->mbk", xb, cb,
                            preferred_element_type=jnp.float32)
        assign = jnp.argmax(scores - half_norm[:, None, :], axis=2)  # [M, B]
        onehot = jax.nn.one_hot(assign, k_cb, dtype=jnp.float32)  # [M, B, K]
        sums = sums + jnp.einsum("mbk,mbd->mkd", onehot, xb,
                                 preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=1)
        return (sums, counts), None

    n_blocks = n // block_rows
    xs = x_sub[:, : n_blocks * block_rows].reshape(
        M, n_blocks, block_rows, d).transpose(1, 0, 2, 3)
    init = (jnp.zeros((M, k_cb, d), jnp.float32),
            jnp.zeros((M, k_cb), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init, xs)
    new_cb = jnp.where(counts[..., None] > 0,
                       sums / jnp.maximum(counts[..., None], 1.0), cb)
    return new_cb, counts


def pq_train(sample: np.ndarray, M: int, iters: int = 12, seed: int = 0,
             block_rows: int = 2048, k: int = K) -> np.ndarray:
    """Train M subspace codebooks (``k`` centroids each; 256 for 8-bit
    codes, 16 for the packed 4-bit family) on a sample.

    sample [n, H] fp32 (H % M == 0).  Returns codebooks [M, k, d_sub] fp32.
    All M k-means run batched on device; empty cells re-seed from the sample
    rows most distant from their assigned centroid (one re-seed pass per
    iteration, the cheap stand-in for FAISS's split heuristic)."""
    sample = np.asarray(sample, np.float32)
    n, H = sample.shape
    assert H % M == 0, f"dim {H} not divisible by M={M}"
    d = H // M
    n = (n // block_rows) * block_rows
    assert n >= block_rows, (
        f"PQ training needs >= {block_rows} sample rows, got {sample.shape[0]}")
    x_sub = jnp.asarray(
        sample[:n].reshape(n, M, d).transpose(1, 0, 2))  # [M, n, d]

    rng = np.random.default_rng(seed)
    init_rows = rng.choice(n, size=k, replace=n < k)
    cb = x_sub[:, jnp.asarray(init_rows), :]

    for it in range(iters):
        cb, counts = _kmeans_step(x_sub, cb, block_rows)
        counts_h = np.asarray(counts)
        n_empty = int((counts_h == 0).sum())
        if n_empty:
            # re-seed empties from fresh random sample rows (per subspace)
            cb_h = np.array(cb)  # np.asarray of a jax array is read-only
            rows = rng.choice(n, size=n_empty, replace=n < n_empty)
            x_h = None
            ptr = 0
            for m in range(M):
                empty = np.where(counts_h[m] == 0)[0]
                if empty.size:
                    if x_h is None:
                        x_h = np.asarray(x_sub)
                    take = rows[ptr:ptr + empty.size]
                    ptr += empty.size
                    cb_h[m, empty] = x_h[m, take % n]
            cb = jnp.asarray(cb_h)
    return np.asarray(cb)


# ---------------------------------------------------------------------------
# encoding / decoding
# ---------------------------------------------------------------------------


def pq4_unpack(codes: jax.Array) -> jax.Array:
    """Unpack nibble codes [M/2, n] int8 -> [M, n] int32 (values 0..15):
    subspace 2i lives in the low nibble of packed row i, 2i+1 in the high."""
    v = codes.astype(jnp.int32) & 255
    return jnp.stack([v & 15, v >> 4], axis=1).reshape(
        2 * codes.shape[0], codes.shape[1])


@jax.jit
def pq_encode_device(reps: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Encode reps [n, H] against codebooks [M, k, d].  8-bit codebooks
    (k=256) -> centered codes [M, n] int8 (value = argmin - 128); 4-bit
    codebooks (k<=16) -> nibble-PACKED codes [M/2, n] int8 (module layout:
    subspace 2i low nibble, 2i+1 high).  One chunk; callers stream big
    corpora chunk-at-a-time (PQIndex.add_chunks)."""
    n, H = reps.shape
    M, k, d = codebooks.shape
    x = reps.astype(jnp.float32).reshape(n, M, d).transpose(1, 0, 2)
    half_norm = 0.5 * jnp.sum(codebooks * codebooks, axis=2)  # [M, K]
    scores = jnp.einsum("mnd,mkd->mnk", x, codebooks,
                        preferred_element_type=jnp.float32)
    assign = jnp.argmax(scores - half_norm[:, None, :], axis=2)  # [M, n]
    if k <= 16:
        even, odd = assign[0::2], assign[1::2]
        return (even | (odd << 4)).astype(jnp.int8)  # wraps 128..255 -> int8
    return (assign - 128).astype(jnp.int8)


@jax.jit
def pq_decode(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Reconstruct [n, H] fp32 from codes (centered [M, n] for 8-bit
    codebooks, nibble-packed [M/2, n] for 4-bit; parity checks and OPQ
    training; one-hot matmul so it is TPU-safe)."""
    M, k, d = codebooks.shape
    if k <= 16:
        idx = pq4_unpack(codes)
    else:
        idx = codes.astype(jnp.int32) + 128
    n = codes.shape[1]
    onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)  # [M, n, K]
    dec = jnp.einsum("mnk,mkd->nmd", onehot, codebooks,
                     preferred_element_type=jnp.float32)
    return dec.reshape(n, M * d)


# ---------------------------------------------------------------------------
# exact-ADC search (XLA scan; portable, certified-exact PQ scores)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def pq_blockwise_topk(
    q_reps: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    k: int,
    block_size: int = 1024,
    valid: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact ADC top-k: scores are EXACTLY ip(q, reconstruction(code)) in
    fp32 (the one-hot decode is exact — each output sums one codebook entry),
    streamed blockwise like index/flat.py:blockwise_topk.

    q_reps [Q, H]; codes [M, N] centered int8 for 8-bit codebooks or
    nibble-packed [M/2, N] for 4-bit (N % block_size == 0 after the caller
    pads); codebooks [M, k, d_sub]."""
    Q, H = q_reps.shape
    M, N = codes.shape  # M is the STORAGE row count (M_sub/2 when packed)
    k_cb = codebooks.shape[1]
    n_valid = jnp.asarray(N if valid is None else valid, jnp.int32)
    pad = (-N) % block_size
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
        N += pad
    n_blocks = N // block_size
    qf = q_reps.astype(jnp.float32)
    local_ids = jnp.arange(block_size, dtype=jnp.int32)
    offsets = jnp.arange(n_blocks, dtype=jnp.int32) * block_size
    code_blocks = codes.reshape(M, n_blocks, block_size).transpose(1, 0, 2)

    init = (jnp.full((Q, k), -jnp.inf, jnp.float32),
            jnp.zeros((Q, k), jnp.int32))

    def body(carry, blk):
        run_s, run_i = carry
        cblk, offset = blk  # [M, B] int8, scalar
        if k_cb <= 16:
            idx = pq4_unpack(cblk)
        else:
            idx = cblk.astype(jnp.int32) + 128
        onehot = jax.nn.one_hot(idx, k_cb, dtype=jnp.float32)  # [M, B, K]
        dec = jnp.einsum("mbk,mkd->bmd", onehot, codebooks,
                         preferred_element_type=jnp.float32)
        dec = dec.reshape(block_size, H)
        s = jnp.dot(qf, dec.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        ids = offset + local_ids
        s = jnp.where(ids[None, :] < n_valid, s, -jnp.inf)
        cat_s = jnp.concatenate([run_s, s], axis=1)
        cat_i = jnp.concatenate(
            [run_i, jnp.broadcast_to(ids, (Q, block_size))], axis=1)
        top_s, pos = jax.lax.top_k(cat_s, k)
        return (top_s, jnp.take_along_axis(cat_i, pos, axis=1)), None

    (scores, indices), _ = jax.lax.scan(body, init, (code_blocks, offsets))
    return scores, indices


# ---------------------------------------------------------------------------
# fused decode-and-scan serve kernel (Pallas)
# ---------------------------------------------------------------------------


def build_bdcb(codebooks: np.ndarray) -> np.ndarray:
    """Expand codebooks [M, k, d_sub] into the block-diagonal decode
    operand [n_groups, 128, G*k] bf16 (module docstring layout; k=256 for
    the 8-bit family, 16 for the 4-bit — the layout generalizes, only the
    per-subspace column count changes)."""
    M, k, d = codebooks.shape
    assert 128 % d == 0, f"d_sub={d} must divide 128 for the Pallas path"
    G = 128 // d
    assert M % G == 0
    n_groups = M // G
    bdcb = np.zeros((n_groups, 128, G * k), np.float32)
    for g in range(n_groups):
        for ml in range(G):
            m = g * G + ml
            # rows ml*d..(ml+1)*d, cols ml*k..(ml+1)*k <- codebook[m].T
            bdcb[g, ml * d:(ml + 1) * d, ml * k:(ml + 1) * k] = codebooks[m].T
    return bdcb.astype(jnp.bfloat16)


def build_bdcb_i8(codebooks: np.ndarray):
    """int8-quantized decode operand: ``(bdcb_i8, scale)`` with ``bdcb_i8``
    [n_groups, 128, G*256] int8 and ``scale`` [n_groups, 128, 1] fp32
    (symmetric per-OUTPUT-DIM scales — each row of the block-diagonal holds
    one output dim's codebook entries, so a per-row scale loses nothing to
    cross-dim range spread).  Feeds the s8 x s8 -> s32 MXU decode path
    (2x the bf16 MACs/cycle on v5e); the quantization error is an SQ8-level
    ~0.4% relative on top of PQ's own reconstruction error — measured
    recall deltas land in BASELINE.md."""
    bd = np.asarray(build_bdcb(codebooks), np.float32)
    amax = np.max(np.abs(bd), axis=2)                       # [n_groups, 128]
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(bd / scale[:, :, None]), -127, 127).astype(np.int8)
    return q, scale[:, :, None]


def _pq_serve_kernel_i8dec(q_ref, codes_ref, bdcb_hbm, scale_ref, out_v_ref,
                           out_i_ref, decoded_ref, onehot_ref, bdcb_vmem,
                           dma_sem, *, J: int, block_size: int, n_valid: int,
                           id_bits: int):
    """int8-decode twin of :func:`_pq_serve_kernel`: the block-diagonal
    one-hot matmul runs s8 x s8 -> s32 on the MXU (int8 throughput is 2x
    bf16 and decode is ~2/3 of serve time), then the s32 accumulator scales
    back per output dim before the bf16 scoring matmul.  Same packed-select
    contract."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    TN = decoded_ref.shape[1]
    n_groups = bdcb_vmem.shape[0]
    GK = bdcb_vmem.shape[2]
    G = GK // K
    SUB = min(GK, _PQ_SUB)
    n_sub = GK // SUB
    G_sub = SUB // K

    @pl.when((b == 0) & (qi == 0))
    def _():
        dma = pltpu.make_async_copy(bdcb_hbm, bdcb_vmem, dma_sem)
        dma.start()
        dma.wait()

    @pl.when(qi == 0)
    def _():
        # hoisted CENTERED iota (Mosaic has no sub-32-bit compare on this
        # target, so the compare runs int32; hoisting still shares one iota
        # across all g/j sub-tiles)
        # 2D iota broadcast over the subspace axis in the compare: the
        # materialized 3D iota was the largest VMEM temp at big blocks
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (K, TN), 0) - 128
        for g in range(n_groups):
            acc = jnp.zeros((128, TN), jnp.int32)
            for j in range(n_sub):
                m0 = g * G + j * G_sub
                cblk = codes_ref[m0:m0 + G_sub, :].astype(jnp.int32)
                oh = (iota_c[None] == cblk[:, None, :]).astype(jnp.int8)
                onehot_ref[:] = oh.reshape(SUB, TN)
                acc = acc + jax.lax.dot_general(
                    bdcb_vmem[g, :, j * SUB:(j + 1) * SUB], onehot_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            sc = scale_ref[g, :, :]  # [128, 1] per-output-dim dequant
            decoded_ref[g * 128:(g + 1) * 128, :] = (
                acc.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    q = q_ref[:].astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, decoded_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block_size,
                   n_valid=n_valid, id_bits=id_bits)


def _pq_serve_kernel(q_ref, codes_ref, bdcb_hbm, out_v_ref, out_i_ref,
                     decoded_ref, onehot_ref, bdcb_vmem, dma_sem, *,
                     J: int, block_size: int, n_valid: int, id_bits: int):
    """Fused PQ decode-and-scan with packed top-J selection.

    Grid (n_blocks, n_qtiles), query tiles innermost: the corpus block decodes
    ONCE per block (at qi == 0) into ``decoded_ref`` [H, TN] bf16 — already
    transposed the way the scoring matmul wants its rhs — then every query
    tile runs one [TQ, H] x [H, TN] MXU matmul + the shared packed select.
    The block-diagonal codebook DMAs HBM->VMEM once at the first grid step
    (it is grid-invariant; a pipelined BlockSpec would double-buffer it)."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    TN = decoded_ref.shape[1]
    n_groups = bdcb_vmem.shape[0]
    GK = bdcb_vmem.shape[2]
    G = GK // K  # subspaces per 128-dim output group
    # one-hot sub-tiles cap VMEM: split each group's GK rows into <=1024 chunks
    SUB = min(GK, _PQ_SUB)
    n_sub = GK // SUB
    G_sub = SUB // K  # subspaces per one-hot sub-tile

    @pl.when((b == 0) & (qi == 0))
    def _():
        dma = pltpu.make_async_copy(bdcb_hbm, bdcb_vmem, dma_sem)
        dma.start()
        dma.wait()

    @pl.when(qi == 0)
    def _():
        # vectorized one-hot per sub-tile: row r of the [SUB, TN] tile is
        # (subspace r//K, code r%K); ONE hoisted iota + compare per
        # sub-tile instead of G_sub unrolled [K, TN] temps (Mosaic stacks
        # unrolled-loop temporaries — the per-ml version blew the 16 MB
        # scoped-vmem limit). int32 compare: the target has no sub-32-bit
        # compare ("Target does not support this comparison")
        # 2D iota broadcast over the subspace axis in the compare: the
        # materialized 3D iota was the largest VMEM temp at big blocks
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (K, TN), 0) - 128
        for g in range(n_groups):
            acc = jnp.zeros((128, TN), jnp.float32)
            for j in range(n_sub):
                m0 = g * G + j * G_sub
                cblk = codes_ref[m0:m0 + G_sub, :].astype(jnp.int32)
                oh = (iota_c[None] == cblk[:, None, :]).astype(jnp.bfloat16)
                onehot_ref[:] = oh.reshape(SUB, TN)
                acc = acc + jax.lax.dot_general(
                    bdcb_vmem[g, :, j * SUB:(j + 1) * SUB], onehot_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            decoded_ref[g * 128:(g + 1) * 128, :] = acc.astype(jnp.bfloat16)

    q = q_ref[:].astype(jnp.bfloat16)  # [TQ, H]
    s = jax.lax.dot_general(
        q, decoded_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [TQ, TN]
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block_size,
                   n_valid=n_valid, id_bits=id_bits)


def _pq4_serve_kernel(q_ref, codes_ref, bdcb_hbm, out_v_ref, out_i_ref,
                      decoded_ref, onehot_ref, bdcb_vmem, dma_sem, *,
                      J: int, block_size: int, n_valid: int, id_bits: int):
    """4-bit twin of :func:`_pq_serve_kernel` (FAISS ``PQ{M}x4`` fast-scan
    analog): nibble-packed codes unpack in-kernel (sq4-kernel idiom), the
    one-hot has 16 columns per subspace instead of 256 — 8x fewer VPU
    compares AND 8x fewer decode MACs per row, which turns decode from ~2/3
    of serve time into a ~20% tax on the scan.  Same packed-select
    contract."""
    b = pl.program_id(0)
    qi = pl.program_id(1)
    TN = decoded_ref.shape[1]
    n_groups = bdcb_vmem.shape[0]
    GK = bdcb_vmem.shape[2]
    G = GK // 16  # subspaces per 128-dim output group
    SUB = min(GK, _PQ_SUB)
    n_sub = GK // SUB
    G_sub = SUB // 16

    @pl.when((b == 0) & (qi == 0))
    def _():
        dma = pltpu.make_async_copy(bdcb_hbm, bdcb_vmem, dma_sem)
        dma.start()
        dma.wait()

    @pl.when(qi == 0)
    def _():
        iota4 = jax.lax.broadcasted_iota(jnp.int32, (16, TN), 0)
        for g in range(n_groups):
            acc = jnp.zeros((128, TN), jnp.float32)
            for j in range(n_sub):
                m0 = g * G + j * G_sub
                v = codes_ref[m0 // 2:m0 // 2 + G_sub // 2, :].astype(
                    jnp.int32) & 255
                # subspace 2i low nibble, 2i+1 high (pq4_unpack layout)
                code32 = jnp.stack([v & 15, v >> 4], axis=1).reshape(
                    G_sub, TN)
                oh = (iota4[None] == code32[:, None, :]).astype(jnp.bfloat16)
                onehot_ref[:] = oh.reshape(SUB, TN)
                acc = acc + jax.lax.dot_general(
                    bdcb_vmem[g, :, j * SUB:(j + 1) * SUB], onehot_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            decoded_ref[g * 128:(g + 1) * 128, :] = acc.astype(jnp.bfloat16)

    q = q_ref[:].astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, decoded_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    _packed_select(s, b, out_v_ref, out_i_ref, J=J, block_size=block_size,
                   n_valid=n_valid, id_bits=id_bits)


def pq_topj_blocks(q, codes, bdcb, J, block_size, n_valid, tq=None,
                   scale=None, nbits=8):
    """Run the fused decode-and-scan kernel, returning the raw per-block
    candidates ``(vals_b, ids_b)`` [n_blocks, J, Q] WITHOUT the final merge
    — the shard_map building block (parallel/sharded_pq.py): per-shard
    ``n_valid`` must be the static shard capacity there, with true-validity
    masking applied by the caller.  Not jitted; call under jit/shard_map.

    ``scale`` selects the decode arithmetic: None -> bf16 block-diagonal
    matmul (``bdcb`` from :func:`build_bdcb`); a [n_groups, 128, 1] array
    -> the s8 x s8 -> s32 MXU decode (``bdcb`` int8 from
    :func:`build_bdcb_i8`)."""
    Q, H = q.shape
    M, N = codes.shape
    n_groups, _, GK = bdcb.shape
    n_blocks = N // block_size
    TQ = min(Q, tq or 256)
    n_qtiles = Q // TQ
    id_bits = max(1, (block_size - 1).bit_length())
    i8dec = scale is not None
    assert not (i8dec and nbits == 4), "int8 decode is an 8-bit-family option"
    kernel = functools.partial(
        _pq4_serve_kernel if nbits == 4
        else (_pq_serve_kernel_i8dec if i8dec else _pq_serve_kernel),
        J=J, block_size=block_size, n_valid=n_valid, id_bits=id_bits)
    in_specs = [
        pl.BlockSpec((TQ, H), lambda b, qi: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((M, block_size), lambda b, qi: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),  # bdcb stays in HBM; DMA'd
    ]
    operands = [q.astype(jnp.float32), codes, bdcb]
    if i8dec:
        in_specs.append(pl.BlockSpec((n_groups, 128, 1), lambda b, qi: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks, n_qtiles),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, J, TQ), lambda b, qi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, TQ), lambda b, qi: (b, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks, J, Q), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, J, Q), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H, block_size), jnp.bfloat16),       # decoded_ref
            pltpu.VMEM((min(GK, _PQ_SUB), block_size),
                       jnp.int8 if i8dec else jnp.bfloat16),  # onehot
            pltpu.VMEM((n_groups, 128, GK),
                       jnp.int8 if i8dec else jnp.bfloat16),  # bdcb_vmem
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=jax.default_backend() != "tpu",
    )(*operands)


@functools.partial(jax.jit,
                   static_argnames=("k", "J", "block_size", "n_valid", "tq",
                                    "nbits"))
def pallas_topk_pq(q, codes, bdcb, k, J, block_size, n_valid, tq=None,
                   scale=None, nbits=8):
    """PQ serving fast path: fused decode-and-scan kernel + candidate merge.

    q [Q, H] fp32 (Q a multiple of tq); codes [M, N] centered int8 with N a
    multiple of block_size; bdcb from :func:`build_bdcb` (or, with ``scale``,
    the int8 pair from :func:`build_bdcb_i8` — the 2x-throughput MXU decode).
    Same packed-select contract as ops/topk.py's serve kernels (scores
    quantized ~2^id_bits ulps, ties break to the smaller id)."""
    Q = q.shape[0]
    vals_b, ids_b = pq_topj_blocks(q, codes, bdcb, J, block_size, n_valid,
                                   tq=tq, scale=scale, nbits=nbits)
    nb = vals_b.shape[0]
    flat_v = jnp.transpose(vals_b, (2, 0, 1)).reshape(Q, nb * J)
    flat_i = jnp.transpose(ids_b, (2, 0, 1)).reshape(Q, nb * J)
    kk = min(k, nb * J)
    top_v, pos = jax.lax.top_k(flat_v, kk)
    return top_v, jnp.take_along_axis(flat_i, pos, axis=1)


PQ_BLOCK = 512   # corpus rows per kernel block: bounds the one-hot +
                 # decoded-reconstruction scratch (~5 MB at H=768, d_sub=8)
PQ_TQ = 256


def pallas_topk_pq_fast(
    q_reps,
    codes: jax.Array,
    codebooks,
    bdcb: jax.Array,
    k: int,
    block_size: int = PQ_BLOCK,
    valid: Optional[int] = None,
    nbits: int = 8,
    scale=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Serving entry: pad (N, Q), pick J by the per-block Poisson rule (see
    ops/topk.py:pallas_topk_fast), run the fused decode-and-scan kernel
    (``scale`` routes 8-bit decode through the s8 MXU variant).  Tiny
    corpora fall back to the exact-ADC scan (no slot ceiling)."""
    q_reps = jnp.asarray(q_reps, jnp.float32)
    Q0 = q_reps.shape[0]
    M, N = codes.shape
    n_valid = int(N if valid is None else valid)
    n_blocks = -(-N // block_size)
    lam = k / n_blocks
    J = max(4, int(np.ceil(lam + 4.0 * np.sqrt(lam) + 4.0)))
    J = min(J, k, block_size)
    if n_blocks * J < min(k, n_valid) or N < 2 * block_size:
        s, i = pq_blockwise_topk(
            q_reps, codes, jnp.asarray(codebooks), min(k, n_valid),
            min(block_size, N), valid=n_valid)
        return np.asarray(s), np.asarray(i)
    pad_n = (-N) % block_size
    codes_p = jnp.pad(codes, ((0, 0), (0, pad_n))) if pad_n else codes
    TQ = min(PQ_TQ, max(8, Q0))
    pad_q = (-Q0) % TQ
    qc = jnp.pad(q_reps, ((0, pad_q), (0, 0))) if pad_q else q_reps
    s, i = pallas_topk_pq(qc, codes_p, bdcb, min(k, n_valid), J, block_size,
                          n_valid, tq=TQ, nbits=nbits, scale=scale)
    return np.asarray(s[:Q0]), np.asarray(i[:Q0])
