"""ctypes binding for the native C++ BM25 engine (native/bm25.cpp).

Drop-in accelerated replacement for the Python ``BM25Retriever``
(evaluator/bm25.py) on the hard-negative mining path — same model and
parameters, postings + dense epoch-stamped scoring instead of Python dicts.
Compiled on first use with g++ (no pybind11 in this image; plain C ABI).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "bm25.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libbm25.so")

_lib = None


def _build_lib() -> str:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    logger.info("building native bm25: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_lib())
    lib.bm25_create.restype = ctypes.c_void_p
    lib.bm25_create.argtypes = [ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.bm25_destroy.argtypes = [ctypes.c_void_p]
    lib.bm25_num_docs.restype = ctypes.c_int64
    lib.bm25_num_docs.argtypes = [ctypes.c_void_p]
    lib.bm25_add_doc.restype = ctypes.c_int32
    lib.bm25_add_doc.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32
    ]
    lib.bm25_finalize.argtypes = [ctypes.c_void_p]
    lib.bm25_search.restype = ctypes.c_int32
    lib.bm25_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.bm25_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_lib()
        return True
    except Exception as exc:  # g++ missing / build failure → Python fallback
        logger.warning("native bm25 unavailable (%s); using Python fallback", exc)
        return False


def _as_i32(seq) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(seq, dtype=np.int32))


class NativeBM25Retriever:
    """API mirror of evaluator.bm25.BM25Retriever backed by the C++ engine."""

    def __init__(self, topK: int = 10, vocab_size: int = None, seed: int = 0,
                 k1: float = 1.2, b: float = 0.75, eps: float = 0.25):
        self._lib = load_lib()
        self._h = self._lib.bm25_create(k1, b, eps)
        self.k1, self.b, self.eps = k1, b, eps  # exposed for cache keying
        self.topK = topK
        self.passage: List[List[int]] = []
        import random

        self._rng = random.Random(seed)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bm25_destroy(self._h)
            self._h = None

    def load_passages(self, corpus: Sequence[dict]) -> Tuple[List[int], List[int]]:
        bp, ep = [], []
        for sample in corpus:
            bp.append(len(self.passage))
            for p in sample["positives"]:
                self._add(p)
            ep.append(len(self.passage))
            for n in sample.get("negatives", []):
                self._add(n)
        self._lib.bm25_finalize(self._h)
        return bp, ep

    def _add(self, tokens) -> None:
        arr = _as_i32(tokens)
        self.passage.append(list(tokens))
        self._lib.bm25_add_doc(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr)
        )

    def search(self, query_tokens: Sequence[int], k: int = 1000,
               exclude: Tuple[int, int] = (0, 0)) -> List[int]:
        arr = _as_i32(query_tokens)
        out_ids = np.empty(k, np.int32)
        out_scores = np.empty(k, np.float32)
        n = self._lib.bm25_search(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr),
            k, exclude[0], exclude[1],
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        out = out_ids[:n].tolist()
        # pad with deterministic random unseen docs (parity with the Python
        # retriever / reference index.py:133-137)
        if len(out) < k and len(self.passage) > len(out):
            chosen = set(out)
            pool = [i for i in range(len(self.passage)) if i not in chosen]
            self._rng.shuffle(pool)
            out.extend(pool[: k - len(out)])
        return out

    def search_batch(self, queries: Sequence[Sequence[int]], k: int,
                     excl_begin=None, excl_end=None) -> np.ndarray:
        """Vectorized mining: [n_queries, k] doc ids (-1 padded)."""
        flat = _as_i32([t for q in queries for t in q])
        offsets = np.zeros(len(queries) + 1, np.int64)
        np.cumsum([len(q) for q in queries], out=offsets[1:])
        out_ids = np.empty((len(queries), k), np.int32)
        out_scores = np.empty((len(queries), k), np.float32)
        eb = _as_i32(excl_begin) if excl_begin is not None else None
        ee = _as_i32(excl_end) if excl_end is not None else None
        null_i32 = ctypes.POINTER(ctypes.c_int32)()
        self._lib.bm25_search_batch(
            self._h,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(queries), k,
            eb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if eb is not None else null_i32,
            ee.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if ee is not None else null_i32,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out_ids
