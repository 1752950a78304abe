"""Product-quantized flat index: the capacity rung past SQ4.

Covers the PQ leg of the reference's FAISS factory surface
(``/root/reference/DRT/evaluator/index.py:47-54`` — "PQ96", "OPQ96,PQ96",
"PCAR384,PQ48" all route through ``faiss.index_factory``) with a TPU-native
engine: codes live code-major [M, N] int8 in HBM (zero tiling pad at M=96),
search is the fused decode-and-scan kernel in ``ops/pq.py`` (reconstruction
decoded block-at-a-time in VMEM via one-hot MXU matmuls, never written to
HBM), training is M batched 256-centroid k-means on device.

Where this sits on the memory ladder (H=768, 16 GB v5e):

=========  ==========  ============  ======================================
storage    bytes/row   rows/chip     scores
=========  ==========  ============  ======================================
fp32       3072        ~5M           exact
bf16       1536        ~10M          exact (bf16 rounding)
SQ8        768+4       ~21M          exact vs int8 rows
SQ4        384+4       ~42M          exact vs int4 rows
PQ96       96          ~160M         ADC (reconstruction) — recall measured
PQ192x4    96          ~160M         4-bit ADC: 8x cheaper decode (serve
                                     ~3x PQ96's qps), nibble-packed codes
PQ96x4     48          ~320M         coarser 4-bit ADC
=========  ==========  ============  ======================================

PQ is the ONLY rung whose scores are reconstructions rather than quantized
rows, so its recall contract is the codebook fit, not a rounding bound —
BASELINE.md records measured recall@k per corpus.  Search modes (exact =
exact-ADC fp32, serve = fused kernel) resolve in ``index/modes.py``.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .modes import resolve_pq_mode


class PQIndex:
    """Device-resident PQ index: train / add / search / save / load.

    API mirror of ``FlatIPIndex`` (and the reference ``BaseFaissIPRetriever``,
    index.py:16-44) so it drops into the trainer/CLI/factory unchanged; the
    trained-index protocol (``is_trained`` + ``train`` + streamed
    ``add_chunks``) matches ``IVFFlatIndex``."""

    def __init__(self, dim: int, M: int = 96, block_size: Optional[int] = None,
                 use_pallas: bool = True, nbits: int = 8):
        # ValueError (not assert): index_factory rejects unserveable
        # strings/geometry with ValueError
        if M <= 0 or dim % M:
            raise ValueError(f"dim {dim} not divisible by M={M}")
        if nbits not in (4, 8):
            raise ValueError(f"PQ nbits must be 4 or 8, got {nbits}")
        if nbits == 4 and M % 2:
            raise ValueError("4-bit PQ packs code pairs: M must be even")
        d_sub = dim // M
        # the fused decode kernel's block-diagonal layout needs d_sub | 128
        # and 128 | dim; other geometries stay valid but serve via the
        # exact-ADC scan (search() falls back when _bdcb is None)
        self._pallas_geometry = (128 % d_sub == 0) and (dim % 128 == 0)
        self.dim = dim
        self.M = M
        self.nbits = nbits
        # hardware-swept kernel blocks (BASELINE.md r4): the 4-bit family's
        # small decode scratch fits 2048-row blocks (fewer blocks -> a far
        # smaller candidate merge, measured 2x over 512); 8-bit is
        # VMEM-bound at 512
        self.block_size = block_size or (2048 if nbits == 4 else 1024)
        self.use_pallas = use_pallas
        self.codebooks: Optional[np.ndarray] = None  # [M, 256, d_sub] fp32
        self._cb_dev = None
        self._bdcb = None
        self._bdcb_i8 = None
        self._bdcb_scale = None
        self._code_slabs: List = []   # [M, n] int8 device slabs
        self._codes = None            # materialized [M, N]
        self._n = 0
        self.docid: List = []

    def __len__(self):
        return self._n

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    def train(self, reps: np.ndarray, iters: int = 12, seed: int = 0) -> None:
        """Fit the M subspace codebooks on sample rows (reference analog:
        ``faiss.index.train``, DRT/evaluator/index.py:52)."""
        from ..ops.pq import pq_train

        reps = np.asarray(reps, np.float32)
        assert reps.shape[1] == self.dim
        self.codebooks = pq_train(reps, self.M, iters=iters, seed=seed,
                                  block_rows=min(2048, reps.shape[0]),
                                  k=1 << self.nbits)
        self._set_codebooks()

    def _set_codebooks(self):
        self._cb_dev = jnp.asarray(self.codebooks)
        if self._pallas_geometry:
            from ..ops.pq import build_bdcb, build_bdcb_i8

            if self.nbits == 8:
                # the s8 MXU decode is the measured-faster 8-bit serve path
                # (1.66x over bf16 decode at 2M, BASELINE.md r4); the bf16
                # operand stays available for the exact-vs-serve tests
                bd8, sc = build_bdcb_i8(self.codebooks)
                self._bdcb_i8 = jnp.asarray(bd8)
                self._bdcb_scale = jnp.asarray(sc)
            self._bdcb = jnp.asarray(build_bdcb(self.codebooks))

    def _encode(self, reps) -> jax.Array:
        from ..ops.pq import pq_encode_device

        return pq_encode_device(jnp.asarray(reps, jnp.float32), self._cb_dev)

    def add(self, reps: np.ndarray) -> None:
        assert self.is_trained, "PQIndex.add before train()"
        reps = np.asarray(reps, np.float32)
        assert reps.shape[1] == self.dim
        self._code_slabs.append(self._encode(reps))
        self._n += reps.shape[0]
        self._codes = None

    def add_device(self, reps) -> None:
        """Encode device-resident embeddings straight to codes (the fp32 reps
        free as soon as the [M, n] int8 slab exists — 32x smaller)."""
        assert self.is_trained, "PQIndex.add_device before train()"
        self._code_slabs.append(self._encode(reps))
        self._n += int(reps.shape[0])
        self._codes = None

    def add_chunks(self, chunk_fn, n_rows: int,
                   chunk_rows: int = 500_000) -> None:
        """Streamed build: peak device memory is ONE fp32 chunk + the growing
        int8 code store (the trained-factory streaming contract the trainer
        relies on, train/trainer.py:_build_trained_index)."""
        assert self.is_trained, "PQIndex.add_chunks before train()"
        for start in range(0, int(n_rows), chunk_rows):
            rows = min(chunk_rows, int(n_rows) - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            self._code_slabs.append(self._encode(chunk))
            chunk.delete()
            self._n += rows
        self._codes = None

    def _materialize(self):
        if self._codes is not None or not self._code_slabs:
            return
        self._codes = (self._code_slabs[0]
                       if len(self._code_slabs) == 1
                       else jnp.concatenate(self._code_slabs, axis=1))
        self._code_slabs = [self._codes]

    def search(self, q_reps, k: int = 1000,
               mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        """Top-k by ADC inner product.  mode="exact": fp32 scores against the
        exact reconstructions (XLA scan).  mode="serve": the fused
        decode-and-scan Pallas kernel (bf16 scoring, packed selection) — the
        TPU hot path.  "approx" aliases to serve; partial/i8q raise
        (index/modes.py)."""
        mode = resolve_pq_mode(mode)
        assert self.is_trained and self._n, "search on an empty/untrained index"
        self._materialize()
        k = min(k, self._n)
        if (mode == "serve" and self.use_pallas and self._bdcb is not None
                and jax.default_backend() == "tpu"):
            from ..ops.pq import pallas_topk_pq_fast

            i8 = self._bdcb_i8 is not None
            return pallas_topk_pq_fast(
                jnp.asarray(q_reps, jnp.float32), self._codes, self._cb_dev,
                self._bdcb_i8 if i8 else self._bdcb, k,
                block_size=self.block_size, valid=self._n, nbits=self.nbits,
                scale=self._bdcb_scale if i8 else None)
        from ..ops.pq import pq_blockwise_topk

        s, i = pq_blockwise_topk(
            jnp.asarray(q_reps, jnp.float32), self._codes, self._cb_dev, k,
            block_size=min(1024, max(256, self._n)), valid=self._n)
        return np.asarray(s), np.asarray(i)

    def batch_search(self, q_reps, k: int, batch_size: int, quiet: bool = True,
                     mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        all_s, all_i = [], []
        for start in range(0, q_reps.shape[0], batch_size):
            s, i = self.search(q_reps[start:start + batch_size], k, mode=mode)
            all_s.append(s)
            all_i.append(i)
        return np.concatenate(all_s), np.concatenate(all_i)

    def reconstruct(self, rows) -> np.ndarray:
        """Decode stored rows back to fp32 vectors (FAISS ``reconstruct_n``
        analog; used by parity tests and the OPQ trainer)."""
        from ..ops.pq import pq_decode

        self._materialize()
        codes = jnp.asarray(self._codes[:, jnp.asarray(rows)])
        return np.asarray(pq_decode(codes, self._cb_dev))

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._materialize()
        codes = (np.asarray(self._codes) if self._codes is not None
                 else np.zeros((self.M, 0), np.int8))
        np.savez(path + ".npz", codes=codes, codebooks=self.codebooks)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"kind": "pq", "dim": self.dim, "M": self.M,
                       "nbits": self.nbits, "n": self._n,
                       "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str) -> "PQIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(meta["dim"], M=meta["M"], nbits=meta.get("nbits", 8))
        with np.load(path + ".npz") as z:
            idx.codebooks = z["codebooks"]
            codes = z["codes"]
        idx._set_codebooks()
        if codes.shape[1]:
            idx._code_slabs = [jnp.asarray(codes)]
        idx._n = int(meta["n"])
        idx.docid = meta.get("docid", [])
        return idx
