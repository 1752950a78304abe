"""IVF-PQ: probe-pruned product-quantized index (``IVF{n},PQ{M}[x4]``).

The composition rung of the factory surface (reference analog:
``faiss.index_factory("IVF4096,PQ96")`` + ``train()``,
``DRT/evaluator/index.py:47-54``): k-means cells prune the scan to
``nprobe/nlist`` of the corpus while PQ codes keep storage at M bytes/row
(~160M x 768 rows per 16 GB v5e chip at M=96, plus the [N] int32 row ids).

TPU shape of the composition (see ``ops/ivf_pq.py`` for the kernel story):
the ragged cell-major bulk layout (``IVFRaggedIndex``) carries PQ CODES
instead of quantized rows, and the bulk kernel decodes each code block in
VMEM (block-diagonal one-hot MXU matmuls) before scoring it against the
cell's query table.  Decode is per-row work, so the 4-bit family
(``IVF{n},PQ{M}x4`` — 16 one-hot columns per subspace) is the serving
sweet spot: decode costs about as much as scanning 16 extra queries, and
the probe cuts the scan by ``nlist/nprobe``.

Residual encoding (FAISS ``by_residual=True`` default): codes store
``x - centroid(cell)``; search adds the probe's ``q . centroid`` back per
(cell, slot), so scores are ADC against ``centroid + decode(code)`` and
the codebooks only have to fit the residual's (much smaller) variance.

Measured operating guidance (BASELINE.md round-5, v5e): ALWAYS chain the
OPQ rotation (``OPQ{M}x4,IVF{n},PQ{M}x4``) — it lifts recall10@100
0.37->0.73+ at 8.8M; and probe ``nprobe ~ nlist/32`` — the swept frontier
point that dominates the flat OPQ scan on BOTH axes (1.2-1.5x qps at
better recall).  At 40M rows (beyond every flat dense rung's HBM) the
residual coding also wins recall outright (0.70-0.71 vs flat PQ's 0.52)
at up to 1.29x the qps — the capacity regime belongs to this family.

Hot cells (IP probing concentrates queries on large-norm centroids) move
to a dense int8 side-scan exactly like the parent class — their rows are
DECODED once to reconstructions and int8-quantized at slab build, so side
scores keep the cell path's reconstruction contract.

Modes (``index/modes.py:resolve_ivfpq_mode``): ``bulk``/``serve`` (alias
``approx``) = the fused kernel; ``exact`` = exact-ADC scan over all
reconstructions (parity checks).  ``probe``/``i8q``/``partial`` raise.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flat import blockwise_topk
from .ivf import IVFRaggedIndex, _assign_device
from .modes import resolve_ivfpq_mode


@jax.jit
def _residual_device(chunk, centroids, assign):
    return chunk.astype(jnp.float32) - centroids[assign]


class IVFPQIndex(IVFRaggedIndex):
    """Ragged IVF with PQ-coded cells: train / add_chunks / search / save.

    ``self._values`` holds the CODE-MAJOR code store
    ``[M_storage, nb_total*block] int8`` (column n = padded position n's
    codes; M_storage = M for 8-bit, M/2 nibble-packed for 4-bit) — the same
    slot the parent keeps row values in, so the shared bulk-search driver
    (Qcap/hot-cell tuning, ``search_bulk_async``) works unchanged through
    the overridden ``_bulk_call``."""

    # the PQ kernel adds ~2-8 MB of decode scratch (decoded block + one-hot
    # + block-diagonal codebook) on top of the scores, so the [Qcap, block]
    # budget halves vs the dense ragged kernel
    QCAP_ELEMS = 131072

    def __init__(self, dim: int, nlist: int = 1024, nprobe: int = 32,
                 M: int = 96, nbits: int = 8, block: int = 512,
                 train_block: int = 8192, qcap_factor: float = 2.0):
        # ValueError (not assert): index_factory's contract is that an
        # unserveable string/geometry raises ValueError
        if M <= 0 or dim % M:
            raise ValueError(f"dim {dim} not divisible by M={M}")
        if nbits not in (4, 8):
            raise ValueError(f"IVFPQ nbits must be 4 or 8, got {nbits}")
        if nbits == 4 and M % 2:
            raise ValueError("4-bit PQ packs code pairs: M must be even")
        d_sub = dim // M
        # the block-diagonal decode needs d_sub | 128 and 128 | dim
        # (ops/pq.py layout); other geometries have no fused kernel here
        if 128 % d_sub or dim % 128:
            raise ValueError(
                f"IVFPQ needs d_sub={d_sub} dividing 128 and dim % 128 == 0 "
                f"(the ops/pq.py block-diagonal decode layout)")
        super().__init__(dim, nlist=nlist, nprobe=nprobe, dtype="pq",
                         block=block, train_block=train_block,
                         qcap_factor=qcap_factor)
        self.M = M
        self.nbits = nbits
        self.codebooks: Optional[np.ndarray] = None  # [M, k, d_sub] fp32
        self._cb_dev = None
        self._bdcb = None

    @property
    def is_trained(self) -> bool:
        return self.centroids is not None and self.codebooks is not None

    # -- training --------------------------------------------------------------

    def train(self, reps, iters: int = 10, seed: int = 0,
              pq_iters: int = 8) -> None:
        """Coarse k-means (parent: device Lloyd's + split-rebalance), then
        the M subspace codebooks on the TRAINING RESIDUALS
        ``x - centroid(assign(x))`` (faiss IVFPQ ``by_residual`` training)."""
        super().train(reps, iters=iters, seed=seed)
        reps_d = jnp.asarray(reps, jnp.float32)
        n = int(reps_d.shape[0])
        assign = _assign_device(reps_d, self.centroids,
                                min(8192, max(8, n)))
        res = np.asarray(_residual_device(reps_d, self.centroids, assign))
        from ..ops.pq import pq_train

        self.codebooks = pq_train(res, self.M, iters=pq_iters, seed=seed,
                                  block_rows=min(2048, n),
                                  k=1 << self.nbits)
        self._set_codebooks()

    def _set_codebooks(self):
        from ..ops.pq import build_bdcb

        self._cb_dev = jnp.asarray(self.codebooks)
        self._bdcb = jnp.asarray(build_bdcb(self.codebooks))

    # -- population --------------------------------------------------------------

    def add_chunks(self, chunk_fn, n_rows: int,
                   chunk_rows: int = 500_000, assign=None) -> None:
        """Two-pass ragged build (parent contract), but pass 2 encodes each
        chunk's RESIDUALS to PQ codes and scatters code COLUMNS — peak HBM
        is one fp32 chunk + its residual + the (32x smaller) code store.
        ``assign``: optional precomputed assignment (parent contract)."""
        if not self.is_trained:
            raise RuntimeError("IVFPQIndex.add_chunks before train()")
        if self._values is not None:
            raise RuntimeError("IVFPQIndex build is one-shot")
        from ..ops.pq import pq_encode_device

        N = int(n_rows)
        if assign is not None:
            assign_all = np.ascontiguousarray(np.asarray(assign, np.int32))
            assert assign_all.shape == (N,), assign_all.shape
        else:
            assign_all = self._assign_pass(chunk_fn, N, chunk_rows)
        self.last_assign = assign_all
        dest, row_ids_flat = self._ragged_layout(assign_all, N)
        nb_total = int(np.asarray(self._block_start)[-1])
        m_storage = self.M // 2 if self.nbits == 4 else self.M
        codes = jnp.zeros((m_storage, nb_total * self.block), jnp.int8)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def place(buf, code_chunk, d):
            return buf.at[:, d].set(code_chunk, mode="drop")

        for start in range(0, N, chunk_rows):
            rows = min(chunk_rows, N - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            a = jnp.asarray(assign_all[start:start + rows])
            res = _residual_device(chunk, self.centroids, a)
            chunk.delete()
            cc = pq_encode_device(res, self._cb_dev)
            res.delete()
            d = jnp.asarray(dest[start:start + rows].astype(np.int32))
            codes = place(codes, cc, d)
            cc.delete()
        self._values = codes             # code-major store (class docstring)
        self._scales = None
        self._row_ids = jnp.asarray(row_ids_flat)
        self._n = N
        self._search_fn = None
        self._bulk_state = None

    # -- search ------------------------------------------------------------------

    def _side_slab(self, hot_ids: np.ndarray):
        """Hot cells decode ONCE to int8-quantized reconstructions
        (``centroid + decode(code)``), so the dense side-scan's absolute
        scores match the cell path's residual-offset ADC."""
        if not hot_ids.size:
            return None, None, None, 0
        from ..ops.pq import pq_decode
        from ..ops.quant import quantize_int8_device

        bs = np.asarray(self._block_start)
        cent = np.asarray(self.centroids)
        parts_v, parts_i = [], []
        for c in hot_ids:
            r0 = int(bs[c]) * self.block
            r1 = int(bs[c + 1]) * self.block
            if r1 > r0:
                rec = np.asarray(pq_decode(self._values[:, r0:r1],
                                           self._cb_dev)) + cent[int(c)]
                parts_v.append(rec)
                parts_i.append(np.asarray(self._row_ids[r0:r1]))
        if not parts_v:
            return None, None, None, 0
        sv = np.concatenate(parts_v) if len(parts_v) > 1 else parts_v[0]
        si = np.concatenate(parts_i) if len(parts_i) > 1 else parts_i[0]
        valid = si >= 0
        order = np.argsort(~valid, kind="stable")
        sv, si = sv[order], si[order]
        n_valid = int(valid.sum())
        pad = (-sv.shape[0]) % self.SIDE_BLOCK
        if pad:
            sv = np.pad(sv, ((0, pad), (0, 0)))
            si = np.pad(si, (0, pad))
        qv, qs = quantize_int8_device(jnp.asarray(sv, jnp.float32),
                                      block_rows=min(1024, sv.shape[0]))
        return qv, qs, jnp.asarray(si), n_valid

    def _bulk_call(self, q, k: int, nprobe: int, i8_native: bool,
                   state: dict, Qcap: int, n_real: int):
        """One IVF-PQ kernel dispatch (``ops/ivf_pq.py:ivf_pq_search``) with
        an explicit tuning state; same device-return contract as the parent
        (``i8_native`` never reaches here — the mode table rejects i8q)."""
        from ..ops.ivf_bulk import serve_j
        from ..ops.ivf_pq import ivf_pq_search

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
        np_eff = min(nprobe, self.nlist - int(state["hot"].size))
        sb = self.SIDE_BLOCK
        side_J = serve_j(k, sb, max(sb, side_valid)) if side_valid else 4
        return ivf_pq_search(
            jnp.asarray(q), self.centroids, self._values, self._row_ids,
            self._block_cell, self._block_start, self._bdcb,
            sv, ss, si,
            k=k, nprobe=np_eff, Qcap=Qcap, J=J, block=block,
            nlist=self.nlist, nb_max=self._nb_max, hot_penalty=hp,
            side_valid=side_valid, side_J=side_J, side_block=sb,
            nbits=self.nbits, n_real=n_real)

    def search(self, q_reps: np.ndarray, k: int = 100,
               mode: str = "bulk",
               nprobe: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Probe-pruned ADC top-k.  ``bulk``/``serve`` (alias ``approx``):
        the fused decode-and-scan cell kernel.  ``exact``: exact-ADC scan
        over every reconstruction (parity checks; still PQ-lossy scores —
        PQ indexes have no lossless mode, index/modes.py)."""
        if self._values is None:
            raise RuntimeError("IVFPQIndex.search before add()")
        mode = resolve_ivfpq_mode(mode)
        k = min(k, self._n)
        q = np.asarray(q_reps, np.float32)
        if mode == "exact":
            return self._search_exact(q, k)
        return self.search_bulk(q, k, nprobe=nprobe, i8_native=False)

    def _search_exact(self, q: np.ndarray, k: int):
        """Exact-ADC flat scan: decode every stored position's
        reconstruction (chunked) and run the blockwise exact top-k."""
        from ..ops.pq import pq_decode

        rid = np.asarray(self._row_ids)
        mask = rid >= 0
        cell_of = np.repeat(np.asarray(self._block_cell), self.block)
        cent = np.asarray(self.centroids)
        parts = []
        total = rid.shape[0]
        for s in range(0, total, 65536):
            e = min(total, s + 65536)
            dec = np.asarray(pq_decode(self._values[:, s:e], self._cb_dev))
            rec = dec + cent[cell_of[s:e]]
            parts.append(rec[mask[s:e]])
        vals = np.concatenate(parts)
        flat_ids = rid[mask]
        s, i = blockwise_topk(jnp.asarray(q), jnp.asarray(vals), k,
                              min(4096, max(8, vals.shape[0])))
        return np.asarray(s), flat_ids[np.asarray(i)]

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path + ".npz",
                 centroids=np.asarray(self.centroids, np.float32),
                 codes=np.asarray(self._values),
                 row_ids=np.asarray(self._row_ids),
                 block_cell=np.asarray(self._block_cell),
                 block_start=np.asarray(self._block_start),
                 codebooks=self.codebooks)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"kind": "ivfpq", "dim": self.dim, "nlist": self.nlist,
                       "nprobe": self.nprobe, "M": self.M,
                       "nbits": self.nbits, "block": self.block,
                       "nb_max": self._nb_max, "n": self._n,
                       "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(meta["dim"], nlist=meta["nlist"], nprobe=meta["nprobe"],
                  M=meta["M"], nbits=meta.get("nbits", 8),
                  block=meta["block"])
        with np.load(path + ".npz") as z:
            idx.centroids = jnp.asarray(z["centroids"])
            idx._values = jnp.asarray(z["codes"])
            idx._row_ids = jnp.asarray(z["row_ids"])
            idx._block_cell = jnp.asarray(z["block_cell"])
            idx._block_start = jnp.asarray(z["block_start"])
            idx.codebooks = z["codebooks"]
        idx._set_codebooks()
        idx._nb_max = meta["nb_max"]
        idx._n = meta["n"]
        idx.docid = meta.get("docid", [])
        return idx
