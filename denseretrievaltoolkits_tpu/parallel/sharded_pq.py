"""ICI-sharded product-quantized index: per-shard decode-and-scan + merge.

Extends the corpus-sharding story (parallel/sharded_index.py, reference
analog ``DRT/trainer/trainer.py:191-262``) to the PQ capacity rung: codes
shard column-wise over the mesh data axis ([n_shards, M, per] — each chip
owns ``per = N/n_shards`` rows of code-major storage, 96 B/row at PQ96, so
an 8-chip v5e pod slice holds ~1.3B x 768 rows), while the codebooks and
their block-diagonal decode expansion replicate (~6 MB).  Search runs under
``shard_map``: every device decodes-and-scans only its own code shard
(ops/pq.py fused kernel), candidates merge with one ``all_gather`` over ICI
+ a final ``lax.top_k`` — identical merge contract to ``ShardedFlatIndex``.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.modes import resolve_pq_mode
from .mesh import DATA_AXIS


class ShardedPQIndex:
    """PQ codes sharded over the mesh data axis; global ADC top-k.

    Same trained-index protocol as ``PQIndex`` (is_trained/train/add_chunks)
    so ``Trainer._build_trained_index`` and ``sharded_index_factory`` drive
    it unchanged.  MULTI-HOST (VERDICT r4 #6, the mh_worker step-10
    pattern): ``train`` gathers every host's sample collectively (identical
    codebooks everywhere), each process adds only its
    ``host_corpus_bounds(global_rows)`` window, and ``_materialize``
    assembles the global mesh array with
    ``make_array_from_process_local_data`` — search is the same SPMD
    shard_map program on every process.  On multi-host the per-shard row
    count is ``ceil(n/n_shards)`` (the host_corpus_bounds layout quantum,
    NOT block-rounded); the fused Pallas path engages only when that count
    happens to be a block multiple, otherwise the jnp decode-scan serves —
    identical results either way."""

    def __init__(self, mesh: Mesh, dim: int, M: int = 96,
                 block_size: Optional[int] = None, use_pallas: bool = True,
                 nbits: int = 8):
        assert dim % M == 0, f"dim {dim} not divisible by M={M}"
        assert nbits in (4, 8), f"PQ nbits must be 4 or 8, got {nbits}"
        assert nbits == 8 or M % 2 == 0, "4-bit PQ packs code pairs: M even"
        if (jax.process_count() > 1
                and int(np.prod(mesh.devices.shape)) % jax.process_count()):
            raise ValueError(
                "ShardedPQIndex needs an equal per-host device count")
        d_sub = dim // M
        self._pallas_geometry = (128 % d_sub == 0) and (dim % 128 == 0)
        self.mesh = mesh
        self.dim = dim
        self.M = M
        self.nbits = nbits
        # storage rows in the code-major layout (nibble pairs pack for 4-bit)
        self.m_rows = M // 2 if nbits == 4 else M
        # same swept defaults as PQIndex (BASELINE.md r4)
        self.block_size = block_size or (2048 if nbits == 4 else 1024)
        self.use_pallas = use_pallas
        self.n_shards = int(np.prod(mesh.devices.shape))
        self.codebooks: Optional[np.ndarray] = None
        self._cb_dev = None
        self._bdcb = None
        self._bdcb_i8 = None
        self._bdcb_scale = None
        self._code_slabs: List = []
        self._codes = None        # [n_shards, M, per] mesh-sharded
        self._per = 0
        self._n = 0
        self.docid: List = []
        self._search_fn = None
        self._search_key = None
        # multi-host: total corpus rows across ALL hosts; each process adds
        # only its host_corpus_bounds window (like ShardedFlatIndex)
        self.global_rows: Optional[int] = None

    def __len__(self):
        return self._n

    @property
    def is_trained(self) -> bool:
        return self.codebooks is not None

    def train(self, reps: np.ndarray, iters: int = 12, seed: int = 0) -> None:
        """COLLECTIVE on multi-host: every host's (local-window, possibly
        different-sized) sample gathers first, so the fit input — and the
        codebooks — are identical on every process (a per-host fit would
        decode with disagreeing codebooks: an inconsistent index)."""
        from ..ops.pq import pq_train

        if jax.process_count() > 1:
            from .sharded_ivf import _collective_sample

            reps = _collective_sample(reps)
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
                bd8, sc = build_bdcb_i8(self.codebooks)
                self._bdcb_i8 = jnp.asarray(bd8)
                self._bdcb_scale = jnp.asarray(sc)
            self._bdcb = jnp.asarray(build_bdcb(self.codebooks))

    def _encode(self, reps) -> jax.Array:
        from ..ops.pq import pq_encode_device

        return pq_encode_device(jnp.asarray(reps, jnp.float32), self._cb_dev)

    def add(self, reps: np.ndarray) -> None:
        assert self.is_trained, "ShardedPQIndex.add before train()"
        reps = np.asarray(reps, np.float32)
        assert reps.shape[1] == self.dim
        self._code_slabs.append(self._encode(reps))
        self._n += reps.shape[0]
        self._codes = None

    add_device = add  # encode accepts host or device reps alike

    def add_chunks(self, chunk_fn, n_rows: int,
                   chunk_rows: int = 500_000) -> None:
        assert self.is_trained, "ShardedPQIndex.add_chunks before train()"
        for start in range(0, int(n_rows), chunk_rows):
            rows = min(chunk_rows, int(n_rows) - start)
            chunk = jnp.asarray(chunk_fn(start, rows))
            self._code_slabs.append(self._encode(chunk))
            chunk.delete()
            self._n += rows
        self._codes = None

    def _materialize(self):
        if self._codes is not None:
            return
        if jax.process_count() > 1:
            self._materialize_multihost()
            return
        assert self._n, "materialize on an empty index"
        codes = (self._code_slabs[0] if len(self._code_slabs) == 1
                 else jnp.concatenate(self._code_slabs, axis=1))
        # per-shard capacity: block-multiple so the kernel grid tiles evenly
        per = -(-self._n // self.n_shards)
        per = per + ((-per) % self.block_size)
        pad = self.n_shards * per - codes.shape[1]
        if pad:
            codes = jnp.pad(codes, ((0, 0), (0, pad)))
        shards = codes.reshape(self.m_rows, self.n_shards,
                               per).transpose(1, 0, 2)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        self._codes = jax.device_put(shards, sharding)
        self._per = per
        self._code_slabs = []
        self._search_fn = None

    def _materialize_multihost(self):
        """Assemble the global [n_shards, m_rows, per] code array from
        per-host windows (metadata only — no cross-host code movement).
        Every host encoded+added exactly its ``host_corpus_bounds`` window,
        the same placement contract as ``ShardedFlatIndex``; ``per`` is the
        layout quantum ceil(n/n_shards) (un-rounded, so the window bounds
        agree with the corpus loader's shard_hosts windows)."""
        from ..utils.distributed import host_corpus_bounds

        if self.global_rows is None:
            raise RuntimeError(
                "multi-host ShardedPQIndex needs index.global_rows set to "
                "the TOTAL corpus size; each process adds only its "
                "host_corpus_bounds window")
        n_global = int(self.global_rows)
        per = -(-n_global // self.n_shards)
        n_local_shards = self.n_shards // jax.process_count()
        start, stop = host_corpus_bounds(n_global,
                                         local_shards=n_local_shards)
        if self._n != stop - start:
            raise RuntimeError(
                f"host added {self._n} rows but its window is "
                f"[{start},{stop}) — feed the corpus loader with "
                "shard_hosts=True")
        codes = (self._code_slabs[0] if len(self._code_slabs) == 1
                 else (jnp.concatenate(self._code_slabs, axis=1)
                       if self._code_slabs
                       else jnp.zeros((self.m_rows, 0), jnp.int8)))
        target = per * n_local_shards
        pad = target - codes.shape[1]
        if pad:
            codes = jnp.pad(codes, ((0, 0), (0, pad)))
        local3 = np.asarray(codes).reshape(self.m_rows, n_local_shards,
                                           per).transpose(1, 0, 2)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        self._codes = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(local3),
            global_shape=(self.n_shards, self.m_rows, per))
        self._per = per
        self._n = n_global
        self._code_slabs = []
        self._search_fn = None

    def _build_search(self, k: int, mode: str, tq: int):
        from ..ops.pq import pq_blockwise_topk, pq_topj_blocks

        mesh = self.mesh
        per = self._per
        n_valid_total = self._n
        block = min(self.block_size, per)
        cb = self._cb_dev
        i8 = self._bdcb_i8 is not None
        bdcb = self._bdcb_i8 if i8 else self._bdcb
        bd_scale = self._bdcb_scale if i8 else None
        use_pallas = (mode == "serve" and self.use_pallas
                      and bdcb is not None
                      and jax.default_backend() == "tpu"
                      and per % block == 0)
        n_blocks = max(1, per // block)
        lam = k / n_blocks
        J = min(k, block, max(4, int(np.ceil(lam + 4.0 * np.sqrt(lam) + 4.0))))

        def local_search(q, codes_shard):
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            offset = shard_idx * per
            local_valid = jnp.clip(n_valid_total - offset, 0, per)
            if use_pallas and n_blocks * J >= min(k, per):
                vals_b, ids_b = pq_topj_blocks(q, codes_shard[0], bdcb, J,
                                               block, per, tq=tq,
                                               nbits=self.nbits,
                                               scale=bd_scale)
                nb = vals_b.shape[0]
                Q = q.shape[0]
                flat_v = jnp.transpose(vals_b, (2, 0, 1)).reshape(Q, nb * J)
                flat_i = jnp.transpose(ids_b, (2, 0, 1)).reshape(Q, nb * J)
                # static n_valid=per in-kernel; true-validity mask here
                flat_v = jnp.where(flat_i < local_valid, flat_v, -jnp.inf)
                kk = min(k, nb * J)
                scores, pos = jax.lax.top_k(flat_v, kk)
                ids = jnp.take_along_axis(flat_i, pos, axis=1)
                if kk < k:
                    scores = jnp.pad(scores, ((0, 0), (0, k - kk)),
                                     constant_values=-jnp.inf)
                    ids = jnp.pad(ids, ((0, 0), (0, k - kk)))
            else:
                scores, ids = pq_blockwise_topk(q, codes_shard[0], cb, k,
                                                block, valid=local_valid)
            ids = ids + offset
            all_scores = jax.lax.all_gather(scores, DATA_AXIS, axis=1,
                                            tiled=True)
            all_ids = jax.lax.all_gather(ids, DATA_AXIS, axis=1, tiled=True)
            top_s, pos = jax.lax.top_k(all_scores, k)
            return top_s, jnp.take_along_axis(all_ids, pos, axis=1)

        fn = shard_map(local_search, mesh=mesh,
                       in_specs=(P(), P(DATA_AXIS, None, None)),
                       out_specs=(P(), P()), check_rep=False)
        return jax.jit(fn)

    def search(self, q_reps, k: int = 1000,
               mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        mode = resolve_pq_mode(mode)
        assert self.is_trained and self._n, "search on an empty/untrained index"
        self._materialize()
        k = min(k, self._n)
        Q0 = int(np.asarray(q_reps).shape[0])
        tq = min(256, max(8, -(-Q0 // 8) * 8))
        key = (k, mode, tq)
        if self._search_fn is None or self._search_key != key:
            self._search_fn = self._build_search(k, mode, tq)
            self._search_key = key
        q = jnp.asarray(q_reps, jnp.float32)
        pad_q = (-Q0) % tq
        if pad_q:
            q = jnp.pad(q, ((0, pad_q), (0, 0)))
        s, i = self._search_fn(q, self._codes)
        return np.asarray(s)[:Q0], np.asarray(i)[:Q0]

    def batch_search(self, q_reps, k: int, batch_size: int, quiet: bool = True,
                     mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        all_s, all_i = [], []
        for start in range(0, q_reps.shape[0], batch_size):
            s, i = self.search(q_reps[start:start + batch_size], k, mode=mode)
            all_s.append(s)
            all_i.append(i)
        return np.concatenate(all_s), np.concatenate(all_i)

    # -- persistence (PQIndex-compatible payload + shard-agnostic meta) ------

    def _local_codes(self) -> np.ndarray:
        """THIS process's code window [m_rows, window] in global row order,
        trimmed of tail padding — via addressable shards only, so it works
        on multi-host arrays too."""
        from ..utils.distributed import host_corpus_bounds

        blocks = {}
        for s in self._codes.addressable_shards:
            lo = s.index[0].start or 0
            if lo not in blocks:
                blocks[lo] = np.asarray(s.data)  # [1, m_rows, per]
        local = np.concatenate([blocks[b] for b in sorted(blocks)], axis=0)
        codes = local.transpose(1, 0, 2).reshape(self.m_rows, -1)
        if jax.process_count() > 1:
            n_local_shards = self.n_shards // jax.process_count()
            start, stop = host_corpus_bounds(int(self._n),
                                             local_shards=n_local_shards)
            return codes[:, : stop - start]
        return codes[:, : self._n]

    def save(self, path: str) -> None:
        """Single-host: one ``.npz`` (codes + codebooks) + meta.  Multi-host:
        COLLECTIVE — each process writes only its window as
        ``<path>.part{h}.npz`` (globally-unique names, no write races),
        process 0 writes the codebooks + meta, and everyone fences before
        returning (the reference's analog is the rank-0 faiss.write_index +
        barrier, DRT/trainer/trainer.py:245-250)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._materialize()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            from ..utils.distributed import host_corpus_bounds

            h = jax.process_index()
            np.savez(f"{path}.part{h}.npz", codes=self._local_codes())
            n_local_shards = self.n_shards // jax.process_count()
            parts = [
                host_corpus_bounds(int(self._n), n_proc=jax.process_count(),
                                   proc_idx=p, local_shards=n_local_shards)
                for p in range(jax.process_count())]
            if h == 0:
                np.savez(path + ".cb.npz", codebooks=self.codebooks)
                with open(path + ".meta.json", "w") as fh:
                    json.dump({"kind": "pq", "dim": self.dim, "M": self.M,
                               "nbits": self.nbits, "n": self._n,
                               "parts": [b - a for a, b in parts],
                               "docid": self.docid}, fh)
            multihost_utils.sync_global_devices("sharded_pq_saved")
            return
        codes = self._local_codes()
        np.savez(path + ".npz", codes=codes, codebooks=self.codebooks)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"kind": "pq", "dim": self.dim, "M": self.M,
                       "nbits": self.nbits, "n": self._n,
                       "docid": self.docid}, fh)

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedPQIndex":
        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(mesh, meta["dim"], M=meta["M"],
                  nbits=meta.get("nbits", 8))
        if jax.process_count() > 1:
            parts = meta.get("parts")
            if parts is None or len(parts) != jax.process_count():
                raise RuntimeError(
                    "multi-host ShardedPQIndex.load needs a checkpoint saved "
                    f"with the same process count (saved parts: {parts})")
            with np.load(path + ".cb.npz") as z:
                idx.codebooks = z["codebooks"]
            with np.load(f"{path}.part{jax.process_index()}.npz") as z:
                codes = z["codes"]
            idx._set_codebooks()
            if codes.shape[1]:
                idx._code_slabs = [jnp.asarray(codes)]
            idx._n = int(codes.shape[1])     # window rows until materialize
            idx.global_rows = int(meta["n"])
            idx.docid = meta.get("docid", [])
            return idx
        with np.load(path + ".npz") as z:
            idx.codebooks = z["codebooks"]
            codes = z["codes"]
        idx._set_codebooks()
        if codes.shape[1]:
            idx._code_slabs = [jnp.asarray(codes)]
        idx._n = int(meta["n"])
        idx.docid = meta.get("docid", [])
        return idx
