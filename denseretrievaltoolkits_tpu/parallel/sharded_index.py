"""ICI-sharded flat index: per-shard blockwise top-k + all_gather merge.

TPU-native replacement for the reference's corpus-sharded evaluation exchange
(``trainer.py:191-262``): each rank encoded its corpus shard, dumped npy to
disk, rank 0 rebuilt one FAISS index, wrote it back to disk, and other ranks
read it.  Here the corpus embedding matrix is ONE jax array sharded over the
mesh's data axis; search runs under ``shard_map`` — every device scans only
its own HBM shard with the blockwise top-k kernel, producing k candidates
with globally-offset ids, and a single ``all_gather`` over ICI merges the
(n_dev × k) candidates with one final ``lax.top_k``.  No disk, no barriers,
and per-query work is N/n_dev per chip.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.flat import DEFAULT_BLOCK, blockwise_topk, quantize_int8
from ..index.modes import resolve_mode
from .mesh import DATA_AXIS


class ShardedFlatIndex:
    """Corpus embeddings sharded over the mesh data axis; exact global top-k."""

    def __init__(self, mesh: Mesh, dim: int, dtype: str = "float32",
                 block_size: int = DEFAULT_BLOCK, use_pallas: bool = True):
        if dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise ValueError(f"ShardedFlatIndex dtype {dtype!r} unsupported")
        self.mesh = mesh
        self.dim = dim
        self.dtype = dtype
        # int4 rows store nibble-packed: [rows, dim/2] int8 + per-row scales
        # (the sq4 kernels unpack in-kernel; half the per-chip HBM of int8 —
        # ~42M x 768 rows per v5e chip, 8 chips > 300M)
        self.stored_dim = dim // 2 if dtype == "int4" else dim
        self.block_size = block_size
        self.use_pallas = use_pallas
        self.n_shards = mesh.shape[DATA_AXIS]
        self._chunks: List[np.ndarray] = []
        self._device_chunks: List = []  # device-native (values, scales|None)
        self._n = 0
        self._corpus = None  # [n_shards, rows_per_shard, dim], sharded on axis 0
        self._scales = None
        self._rows_per_shard = 0
        self.docid: List = []
        self._search_fn = None
        # multi-host: total corpus rows across ALL hosts. Each host adds only
        # its contiguous window (utils.distributed.host_corpus_bounds) and
        # materialization assembles the global array from the local windows.
        self.global_rows: Optional[int] = None

    def __len__(self):
        return self._n

    def add(self, p_reps: np.ndarray) -> None:
        assert not self._device_chunks, "mixing add() and add_device() unsupported"
        p_reps = np.asarray(p_reps, np.float32)
        assert p_reps.shape[1] == self.dim
        self._chunks.append(p_reps)
        self._n += p_reps.shape[0]
        self._corpus = None

    def add_device(self, p_reps) -> None:
        """Append device-resident embeddings without a host round-trip: int8
        corpora quantize on device at add time; materialization reshards the
        concatenated array straight onto the mesh (ICI scatter, no host)."""
        assert not self._chunks, "mixing add() and add_device() unsupported"
        n = int(p_reps.shape[0])
        if self.dtype == "int8":
            from ..ops.quant import quantize_int8_device

            v, s = quantize_int8_device(
                jnp.asarray(p_reps), block_rows=min(1024, n)
            )
            self._device_chunks.append((v[:n], s[:n]))
        elif self.dtype == "int4":
            from ..ops.quant import quantize_int4_device

            v, s = quantize_int4_device(
                jnp.asarray(p_reps), block_rows=min(1024, n)
            )
            self._device_chunks.append((v[:n], s[:n]))
        elif self.dtype == "bfloat16":
            self._device_chunks.append((jnp.asarray(p_reps, jnp.bfloat16), None))
        else:
            self._device_chunks.append((jnp.asarray(p_reps, jnp.float32), None))
        self._n += n
        self._corpus = None

    def _materialize(self):
        if self._corpus is not None:
            return
        if jax.process_count() > 1:
            self._materialize_multihost()
            return
        # pad rows so every shard holds the same static count
        per = -(-self._n // self.n_shards)
        pad = per * self.n_shards - self._n
        self._rows_per_shard = per
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        scale_sharding = NamedSharding(self.mesh, P(DATA_AXIS, None))

        if self._device_chunks:
            # device-native path: concat + reshard over ICI, never via host
            values = jnp.concatenate([v for v, _ in self._device_chunks], axis=0)
            if pad:
                values = jnp.pad(values, ((0, pad), (0, 0)))
            self._corpus = jax.device_put(
                values.reshape(self.n_shards, per, self.stored_dim), sharding
            )
            if self.dtype in ("int8", "int4"):
                scales = jnp.concatenate([s for _, s in self._device_chunks])
                if pad:
                    scales = jnp.pad(scales, (0, pad))
                self._scales = jax.device_put(
                    scales.reshape(self.n_shards, per), scale_sharding
                )
            else:
                self._scales = None
            self._search_fn = None
            return

        full = np.concatenate(self._chunks, axis=0)
        if pad:
            full = np.concatenate([full, np.zeros((pad, self.dim), np.float32)])

        if self.dtype == "int8":
            values, scales = quantize_int8(full)
            corpus_np, scales_np = values, scales
        elif self.dtype == "int4":
            from ..ops.quant import quantize_int4_device

            v_d, s_d = quantize_int4_device(jnp.asarray(full))
            corpus_np, scales_np = np.asarray(v_d), np.asarray(s_d)
        elif self.dtype == "bfloat16":
            corpus_np, scales_np = full, None
        else:
            corpus_np, scales_np = full, None

        stacked = corpus_np.reshape(self.n_shards, per, self.stored_dim)
        arr = jnp.asarray(stacked, jnp.bfloat16 if self.dtype == "bfloat16" else None)
        self._corpus = jax.device_put(arr, sharding)
        if scales_np is not None:
            self._scales = jax.device_put(
                jnp.asarray(scales_np.reshape(self.n_shards, per)), scale_sharding
            )
        else:
            self._scales = None
        self._search_fn = None

    def _materialize_multihost(self):
        """Assemble the global sharded corpus from per-host windows.

        Every host encoded+added the contiguous row window
        host_corpus_bounds(global_rows) — the window that lands on ITS devices
        under the [n_shards, per, dim] layout — so assembly is
        ``make_array_from_process_local_data`` (metadata, no host exchange).
        This replaces the reference's npy→disk→rank-0-FAISS→disk broadcast
        (DRT/trainer/trainer.py:191-262)."""
        if self.global_rows is None:
            raise RuntimeError(
                "multi-host ShardedFlatIndex needs index.global_rows set to the "
                "TOTAL corpus size; each process adds only its "
                "host_corpus_bounds window")
        n_global = int(self.global_rows)
        per = -(-n_global // self.n_shards)
        n_local_shards = self.n_shards // jax.process_count()
        target = per * n_local_shards  # local rows incl. trailing padding
        from ..utils.distributed import host_corpus_bounds

        start, stop = host_corpus_bounds(
            n_global, local_shards=n_local_shards)
        if self._n != stop - start:
            raise RuntimeError(
                f"host added {self._n} rows but its window is [{start},{stop}) — "
                "feed the corpus loader with shard_hosts=True")

        if self._device_chunks:
            values = jnp.concatenate([v for v, _ in self._device_chunks], axis=0)
            scales = (jnp.concatenate([s for _, s in self._device_chunks])
                      if self.dtype in ("int8", "int4") else None)
        else:
            full = (np.concatenate(self._chunks, axis=0) if self._chunks
                    else np.zeros((0, self.dim), np.float32))
            if self.dtype == "int8":
                values, scales = quantize_int8(full)
            elif self.dtype == "int4":
                from ..ops.quant import quantize_int4_device

                v_d, s_d = quantize_int4_device(jnp.asarray(full))
                values, scales = np.asarray(v_d), np.asarray(s_d)
            elif self.dtype == "bfloat16":
                values, scales = jnp.asarray(full, jnp.bfloat16), None
            else:
                values, scales = full, None
        pad = target - self._n
        if pad:
            values = jnp.pad(jnp.asarray(values), ((0, pad), (0, 0)))
            if scales is not None:
                scales = jnp.pad(jnp.asarray(scales), (0, pad))
        local3 = np.asarray(values).reshape(n_local_shards, per,
                                            self.stored_dim)
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        self._corpus = jax.make_array_from_process_local_data(
            sharding, local3,
            global_shape=(self.n_shards, per, self.stored_dim))
        if scales is not None:
            self._scales = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P(DATA_AXIS, None)),
                np.asarray(scales).reshape(n_local_shards, per),
                global_shape=(self.n_shards, per))
        else:
            self._scales = None
        self._rows_per_shard = per
        self._n = n_global
        self._search_fn = None

    def _build_search(self, k: int, mode: str = "exact",
                      tq: Optional[int] = None):
        mesh = self.mesh
        per = self._rows_per_shard
        n_valid_total = self._n
        from ..ops.topk import safe_block

        kernel_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                        "int8": jnp.int8, "int4": jnp.int8}[self.dtype]
        # int4 stores dim/2 packed bytes but unpacks to dim in-kernel, so the
        # full dim is the conservative VMEM bound either way
        block = safe_block(self.dim, kernel_dtype, min(self.block_size, per))
        has_scales = self._scales is not None
        int4 = self.dtype == "int4"
        use_pallas = (
            self.use_pallas and jax.default_backend() == "tpu"
            and per % block == 0
        )
        # ``mode`` arrives RESOLVED (exact|serve|partial|i8q, index/modes.py);
        # "partial" degrades to uncertified Pallas candidates here —
        # PartialReduce cannot see across shards
        certify = mode == "exact"

        def local_exact(q, corpus_rows, scales_rows, local_valid):
            """Per-shard exact top-k: Pallas fast path with an in-graph
            certificate; lax.cond falls back to the scan when any query's
            candidates may be incomplete (rare), so results stay exact."""
            if not use_pallas:
                return blockwise_topk(
                    q, corpus_rows, k, block,
                    scales=scales_rows if has_scales else None,
                    valid=local_valid, int4=int4,
                )

            from ..ops.topk import (
                _pallas_block_topj,
                _pallas_block_topj_packed,
                _pallas_block_topj_packed_i8q,
                _pallas_block_topj_packed_scaled,
                _pallas_block_topj_packed_sq4,
                _pallas_block_topj_packed_sq4_i8q,
                _pallas_block_topj_scaled,
                _pallas_block_topj_sq4,
                quantize_queries,
            )

            if mode in ("serve", "i8q"):
                # packed-selection serving kernel; J sized by the Poisson
                # tail rule (see ops/topk.py:pallas_topk_fast)
                lam = k / max(1, per // block)
                J = min(k, block,
                        max(4, int(np.ceil(lam + 4.0 * np.sqrt(lam) + 4.0))))
            else:
                J = max(4, min(k, 8))
            qb = q.astype(jnp.bfloat16 if corpus_rows.dtype != jnp.float32 else jnp.float32)
            # n_valid masking inside the kernel needs a static bound, but the
            # per-shard valid count is traced under shard_map — pass the full
            # static row count (no in-kernel masking) and mask here instead
            if mode == "i8q" and int4:
                # int4 shards: the native sq4 MXU kernel (nibble rows widen
                # to int8 in-kernel; queries quantized in-graph, replicated)
                qi, qsq = quantize_queries(q)
                vals_b, ids_b = _pallas_block_topj_packed_sq4_i8q(
                    qi, corpus_rows, scales_rows, qsq, J, block, per, tq=tq
                )
            elif mode == "i8q":
                # int8 shards: the native-int8 MXU kernel (s8·s8→s32, queries
                # quantized in-graph — replicated, so every shard agrees;
                # resolve_mode guarantees scales exist)
                qi, qsq = quantize_queries(q)
                vals_b, ids_b = _pallas_block_topj_packed_i8q(
                    qi, corpus_rows, scales_rows, qsq, J, block, per, tq=tq
                )
            elif mode == "serve" and int4:
                vals_b, ids_b = _pallas_block_topj_packed_sq4(
                    qb, corpus_rows, scales_rows, J, block, per, tq=tq
                )
            elif mode == "serve" and has_scales:
                vals_b, ids_b = _pallas_block_topj_packed_scaled(
                    qb, corpus_rows, scales_rows, J, block, per, tq=tq
                )
            elif mode == "serve":
                vals_b, ids_b = _pallas_block_topj_packed(
                    qb, corpus_rows, J, block, per, tq=tq
                )
            elif int4:
                # certified sq4 kernel: exact fp32 scoring over unpacked
                # nibbles; the certificate/fallback below stays shared
                vals_b, ids_b = _pallas_block_topj_sq4(
                    q.astype(jnp.float32), corpus_rows, scales_rows, J,
                    block, per
                )
            elif has_scales:
                vals_b, ids_b = _pallas_block_topj_scaled(
                    qb, corpus_rows, scales_rows, J, block, per
                )
            else:
                vals_b, ids_b = _pallas_block_topj(qb, corpus_rows, J, block, per,
                                                   tq=tq)
            nb = vals_b.shape[0]
            Q = q.shape[0]
            row_ids = jnp.transpose(ids_b, (2, 0, 1)).reshape(Q, nb * J)
            flat_v = jnp.transpose(vals_b, (2, 0, 1)).reshape(Q, nb * J)
            flat_v = jnp.where(row_ids < local_valid, flat_v, -jnp.inf)
            kk = min(k, nb * J)
            top_v, pos = jax.lax.top_k(flat_v, kk)
            top_i = jnp.take_along_axis(row_ids, pos, axis=1)
            if kk < k:
                top_v = jnp.pad(top_v, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
                top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)))
            if not certify:
                # serve/partial/i8q: Pallas candidates without the exactness
                # certificate (recall-targeted, like approx_max_k)
                return top_v, top_i
            theta = top_v[:, -1:]
            vals_last = jnp.transpose(vals_b[:, :, -1])  # [Q, nb]
            flagged = jnp.any(vals_last >= theta - (1e-6 * jnp.abs(theta) + 1e-30))

            def exact_path(_):
                return blockwise_topk(
                    q, corpus_rows, k, block,
                    scales=scales_rows if has_scales else None,
                    valid=local_valid, int4=int4,
                )

            return jax.lax.cond(flagged, exact_path, lambda _: (top_v, top_i), None)

        def local_search(q, corpus_shard, scales_shard):
            # corpus_shard: [1, per, dim] (this device's rows)
            shard_idx = jax.lax.axis_index(DATA_AXIS)
            offset = shard_idx * per
            # rows beyond the global corpus length are padding
            local_valid = jnp.clip(n_valid_total - offset, 0, per)
            scores, ids = local_exact(
                q, corpus_shard[0],
                scales_shard[0] if has_scales else None,
                local_valid,
            )
            ids = ids + offset
            # merge candidates from every shard over ICI
            all_scores = jax.lax.all_gather(scores, DATA_AXIS, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(ids, DATA_AXIS, axis=1, tiled=True)
            top_s, pos = jax.lax.top_k(all_scores, k)
            top_i = jnp.take_along_axis(all_ids, pos, axis=1)
            return top_s, top_i

        in_specs = (
            P(),  # queries replicated
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None) if has_scales else P(),
        )
        fn = shard_map(
            local_search,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_rep=False,
        )
        return jax.jit(fn)

    def search(self, q_reps: np.ndarray, k: int = 1000,
               mode: str = "exact") -> Tuple[np.ndarray, np.ndarray]:
        self._materialize()
        mode = resolve_mode(mode, self.dtype)
        k = min(k, self._n)
        # query tiling: the serve path rides the hardware-swept resident tile
        # (SERVE_TQ=512 bought the single-chip 76k-qps number — ops/topk.py);
        # queries pad up to a tile multiple so the kernel grid covers them all
        from ..ops.topk import QUERY_TILE, SERVE_TQ

        Q0 = int(np.asarray(q_reps).shape[0])
        packed = mode in ("serve", "i8q")
        tq = min(SERVE_TQ if packed else QUERY_TILE,
                 max(8, -(-Q0 // 8) * 8))
        if self._search_fn is None or getattr(self, "_search_key", None) != (k, mode, tq):
            self._search_fn = self._build_search(k, mode, tq=tq)
            self._search_key = (k, mode, tq)
        q = jnp.asarray(q_reps, jnp.float32)
        pad_q = (-Q0) % tq
        if pad_q:
            q = jnp.pad(q, ((0, pad_q), (0, 0)))
        dummy_scales = self._scales if self._scales is not None else jnp.zeros((1,), jnp.float32)
        scores, indices = self._search_fn(q, self._corpus, dummy_scales)
        return np.asarray(scores)[:Q0], np.asarray(indices)[:Q0]

    def batch_search(self, q_reps, k, batch_size, quiet=False, mode: str = "exact"):
        out_s, out_i = [], []
        for start in range(0, q_reps.shape[0], batch_size):
            s, i = self.search(q_reps[start : start + batch_size], k, mode=mode)
            out_s.append(s)
            out_i.append(i)
        return np.concatenate(out_s), np.concatenate(out_i)

    # -- persistence (same on-disk format as FlatIPIndex.save/load) ----------

    def _read_local_shards(self):
        """This process's materialized rows (its mesh window), in global row
        order, trimmed of tail padding — via addressable shards only, so it
        works on multi-host arrays too."""
        blocks = {}
        for s in self._corpus.addressable_shards:
            start = s.index[0].start or 0
            if start not in blocks:
                blocks[start] = np.asarray(s.data)
        values = np.concatenate(
            [blocks[b].reshape(-1, self.stored_dim) for b in sorted(blocks)])
        scales = None
        if self._scales is not None:
            sblocks = {}
            for s in self._scales.addressable_shards:
                start = s.index[0].start or 0
                if start not in sblocks:
                    sblocks[start] = np.asarray(s.data)
            scales = np.concatenate(
                [sblocks[b].reshape(-1) for b in sorted(sblocks)])
        if jax.process_count() > 1:
            _, _, start, stop = self._window_layout(int(self._n))
            win = stop - start
        else:
            win = self._n
        return values[:win], (scales[:win] if scales is not None else None)

    def _local_payload(self):
        """(values, scales) for THIS process's rows, in add order — quantized
        native bytes for int8/int4, fp32 otherwise (the on-disk format).
        Falls back to reading the materialized mesh shards (e.g. an index
        that was loaded rather than built)."""
        if self.dtype in ("int8", "int4"):
            if self._device_chunks:
                values = np.concatenate(
                    [np.asarray(v, np.int8) for v, _ in self._device_chunks])
                scales = np.concatenate(
                    [np.asarray(s, np.float32)
                     for _, s in self._device_chunks])
            elif self._chunks:
                full = np.concatenate(self._chunks, axis=0)
                if self.dtype == "int8":
                    values, scales = quantize_int8(full)
                else:
                    from ..ops.quant import quantize_int4_device

                    v_d, s_d = quantize_int4_device(jnp.asarray(full))
                    values, scales = np.asarray(v_d), np.asarray(s_d)
            elif self._corpus is not None:
                values, scales = self._read_local_shards()
                values = values.astype(np.int8, copy=False)
            else:
                values = np.zeros((0, self.stored_dim), np.int8)
                scales = np.zeros((0,), np.float32)
            return values, scales
        if self._device_chunks:
            values = np.concatenate([np.asarray(v, np.float32)
                                     for v, _ in self._device_chunks])
        elif self._chunks:
            values = np.concatenate(self._chunks, axis=0)
        elif self._corpus is not None:
            values, _ = self._read_local_shards()
            values = np.asarray(values, np.float32)
        else:
            values = np.zeros((0, self.dim), np.float32)
        return values, None

    def _window_layout(self, n_global: int):
        """(per-shard rows, local shard count, this host's [start, stop))."""
        from ..utils.distributed import host_corpus_bounds

        per = -(-int(n_global) // self.n_shards)
        local_shards = self.n_shards // jax.process_count()
        start, stop = host_corpus_bounds(int(n_global),
                                         local_shards=local_shards)
        return per, local_shards, start, stop

    def _save_multihost(self, path: str) -> None:
        """COLLECTIVE multi-host save: each process writes ONLY its window
        payload as ``<path>.part{h}.npz`` (globally-unique names on the
        shared FS — no write races, no cross-host data movement, host RAM
        stays O(window) rather than O(corpus)), process 0 writes the meta,
        and everyone fences before returning so a following load never
        reads a half-written artifact.  The reference's analog is the
        rank-0 ``faiss.write_index`` + barrier (trainer.py:245-250)."""
        import json
        import os

        from jax.experimental import multihost_utils

        if self.global_rows is None:
            raise RuntimeError("multi-host save needs index.global_rows")
        n_global = int(self.global_rows)
        _, _, start, stop = self._window_layout(n_global)
        values, scales = self._local_payload()
        if values.shape[0] != stop - start:
            raise RuntimeError(
                f"host holds {values.shape[0]} rows, window is "
                f"[{start},{stop})")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        h = jax.process_index()
        if scales is not None:
            np.savez(f"{path}.part{h}.npz", values=values, scales=scales)
        else:
            np.savez(f"{path}.part{h}.npz", reps=values)
        # every host knows every window length (pure layout arithmetic)
        P = jax.process_count()
        per, local_shards, _, _ = self._window_layout(n_global)
        target = per * local_shards
        part_rows = [min(n_global, (p + 1) * target) - min(n_global,
                                                           p * target)
                     for p in range(P)]
        if h == 0:
            with open(path + ".meta.json", "w") as fh:
                json.dump({"dim": self.dim, "dtype": self.dtype,
                           "n": n_global, "parts": part_rows,
                           "docid": self.docid}, fh)
        multihost_utils.sync_global_devices("sharded_flat_saved")

    def save(self, path: str) -> None:
        """Native payload on disk (int8/int4: values + scales — 4-8x less
        disk than a fp32 round-trip, NO double quantization on reload).
        Multi-host: per-window part files + a rank-0 meta + a fence
        (``_save_multihost``)."""
        import json
        import os

        if jax.process_count() > 1:
            self._save_multihost(path)
            return
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        values, scales = self._local_payload()
        if scales is not None:
            np.savez(path + ".npz", values=values, scales=scales)
        else:
            np.savez(path + ".npz", reps=values)
        with open(path + ".meta.json", "w") as fh:
            json.dump({"dim": self.dim, "dtype": self.dtype, "n": self._n,
                       "docid": self.docid}, fh)

    def _place_native(self, values: np.ndarray, scales: Optional[np.ndarray]) -> None:
        """Place pre-quantized/pre-cast rows straight onto the mesh shards
        (no host fp32 materialization, no requantization)."""
        n = int(values.shape[0])
        per = -(-n // self.n_shards)
        pad = per * self.n_shards - n
        if pad:
            values = np.concatenate(
                [values, np.zeros((pad, self.stored_dim), values.dtype)])
            if scales is not None:
                scales = np.concatenate([scales, np.zeros((pad,), scales.dtype)])
        self._n = n
        self._rows_per_shard = per
        sharding = NamedSharding(self.mesh, P(DATA_AXIS, None, None))
        self._corpus = jax.device_put(
            jnp.asarray(values.reshape(self.n_shards, per, self.stored_dim)),
            sharding)
        if scales is not None:
            self._scales = jax.device_put(
                jnp.asarray(scales.reshape(self.n_shards, per)),
                NamedSharding(self.mesh, P(DATA_AXIS, None)))
        else:
            self._scales = None
        self._search_fn = None

    def _place_native_multihost(self, values: np.ndarray,
                                scales: Optional[np.ndarray],
                                n_global: int) -> None:
        """Each process places ONLY its window of a full native payload onto
        its local devices (``make_array_from_process_local_data`` — no
        cross-host movement; the file is on a shared FS, reference analog
        ``faiss.read_index`` from rank 0's write, trainer.py:252-262)."""
        _, _, start, stop = self._window_layout(n_global)
        self._place_window(values[start:stop],
                           scales[start:stop] if scales is not None else None,
                           n_global)

    def _place_window(self, win_v: np.ndarray,
                      scales: Optional[np.ndarray], n_global: int) -> None:
        """Place THIS host's window rows onto its local devices."""
        per, local_shards, start, stop = self._window_layout(n_global)
        target = per * local_shards
        pad = target - win_v.shape[0]
        if pad:
            win_v = np.concatenate(
                [win_v, np.zeros((pad,) + win_v.shape[1:], win_v.dtype)])
        self._corpus = jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, P(DATA_AXIS, None, None)),
            win_v.reshape(local_shards, per, self.stored_dim),
            global_shape=(self.n_shards, per, self.stored_dim))
        if scales is not None:
            win_s = scales[start:stop]
            if pad:
                win_s = np.concatenate(
                    [win_s, np.zeros((pad,), win_s.dtype)])
            self._scales = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P(DATA_AXIS, None)),
                win_s.reshape(local_shards, per),
                global_shape=(self.n_shards, per))
        else:
            self._scales = None
        self._n = n_global
        self.global_rows = n_global
        self._rows_per_shard = per
        self._search_fn = None

    @classmethod
    def _read_parts(cls, path: str, part_rows, lo: int, hi: int):
        """Rows [lo, hi) of a multi-part artifact, reading ONLY the part
        files that overlap (host RAM stays O(hi - lo))."""
        offs = np.concatenate([[0], np.cumsum(part_rows)]).astype(np.int64)
        vs, ss = [], []
        for p in range(len(part_rows)):
            a, b = max(lo, int(offs[p])), min(hi, int(offs[p + 1]))
            if a >= b:
                continue
            with np.load(f"{path}.part{p}.npz") as z:
                key = "values" if "values" in z else "reps"
                vs.append(z[key][a - offs[p] : b - offs[p]])
                if "scales" in z:
                    ss.append(z["scales"][a - offs[p] : b - offs[p]])
        values = (np.concatenate(vs) if vs
                  else np.zeros((0, 0), np.float32))
        scales = np.concatenate(ss) if ss else None
        return values, scales

    @classmethod
    def load(cls, path: str, mesh: Mesh) -> "ShardedFlatIndex":
        import json

        with open(path + ".meta.json") as fh:
            meta = json.load(fh)
        idx = cls(mesh, meta["dim"], dtype=meta["dtype"])
        multihost = jax.process_count() > 1
        n_global = int(meta["n"])
        if "parts" in meta:  # multi-host artifact: per-window part files
            if multihost:
                _, _, lo, hi = idx._window_layout(n_global)
            else:
                lo, hi = 0, n_global
            values, scales = cls._read_parts(path, meta["parts"], lo, hi)
            if meta["dtype"] == "bfloat16":
                values = np.asarray(jnp.asarray(values, jnp.bfloat16))
            elif meta["dtype"] not in ("int8", "int4"):
                values = np.asarray(values, np.float32)
            if multihost:
                idx._place_window(values, scales, n_global)
            else:
                idx._place_native(values, scales)
            idx.docid = meta.get("docid", [])
            return idx
        with np.load(path + ".npz") as z:
            if "values" in z:  # native int8/int4: shards straight to mesh
                if multihost:
                    idx._place_native_multihost(z["values"], z["scales"],
                                                n_global)
                else:
                    idx._place_native(z["values"], z["scales"])
                idx.docid = meta.get("docid", [])
                return idx
            reps = z["reps"]
        if reps.shape[0]:
            if multihost:
                cast = (np.asarray(jnp.asarray(reps, jnp.bfloat16))
                        if meta["dtype"] == "bfloat16" else
                        np.asarray(reps, np.float32))
                idx._place_native_multihost(cast, None, n_global)
            elif meta["dtype"] == "bfloat16":
                idx._place_native(
                    np.asarray(jnp.asarray(reps, jnp.bfloat16)), None)
            else:
                idx.add(reps)
        idx.docid = meta.get("docid", [])
        return idx
