"""int4 (SQ4) index path: nibble-packed corpus, per-row scales.

Half the HBM of int8 — the capability that fits the reference's 21M-passage
Wikipedia corpus (run.sh:13-14, CorpusDataset.py:16) on ONE chip. Layout:
each packed byte holds feature dim d (low nibble) and d + H/2 (high nibble),
so the search kernels unpack with two sign-extends and score with two
matmuls (ops/quant.py, ops/topk.py:_block_topj_kernel_packed_sq4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex, blockwise_topk, index_factory
from denseretrievaltoolkits_tpu.ops.quant import dequantize_int4, quantize_int4_device


def _data(rng, n=500, dim=64):
    corpus = rng.normal(size=(n, dim)).astype(np.float32)
    q = rng.normal(size=(5, dim)).astype(np.float32)
    return corpus, q


def test_quantize_int4_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 64)).astype(np.float32)
    v, s = quantize_int4_device(jnp.asarray(x), block_rows=32)
    assert v.shape == (100, 32) and v.dtype == jnp.int8
    d = np.asarray(dequantize_int4(v, s))
    # int4 symmetric absmax: max error is scale/2 = absmax/14 per element
    absmax = np.abs(x).max(axis=1, keepdims=True)
    assert (np.abs(d - x) <= absmax / 14 + 1e-6).all()


def test_blockwise_int4_matches_dequant():
    rng = np.random.default_rng(1)
    corpus, q = _data(rng)
    v, s = quantize_int4_device(jnp.asarray(corpus), block_rows=128)
    top_s, top_i = blockwise_topk(jnp.asarray(q), v, 10, 128, scales=s,
                                  int4=True)
    deq = np.asarray(dequantize_int4(v, s))
    full = q @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(top_i), ref_i)
    np.testing.assert_allclose(np.asarray(top_s),
                               -np.sort(-full, axis=1)[:, :10],
                               rtol=1e-4, atol=1e-4)


def test_packed_sq4_kernel_matches_dequant():
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_sq4

    rng = np.random.default_rng(2)
    corpus, q = _data(rng, n=1024)
    corpus[:256] -= 2.0  # negative-score region
    v, s = quantize_int4_device(jnp.asarray(corpus), block_rows=256)
    top_s, top_i = pallas_topk_serve_sq4(
        jnp.asarray(q, jnp.float32), v, s, 10, 10, 256, 1024)
    deq = np.asarray(dequantize_int4(v, s))
    full = q @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(top_i), ref_i)
    np.testing.assert_allclose(np.asarray(top_s),
                               -np.sort(-full, axis=1)[:, :10],
                               rtol=2e-3, atol=2e-3)


def test_flat_int4_index_recall_and_modes():
    rng = np.random.default_rng(3)
    corpus, q = _data(rng, n=600)
    idx = index_factory(64, "SQ4", block_size=128)
    idx.add(corpus)
    assert idx.dtype == "int4" and len(idx) == 600
    s, i = idx.search(q, 20)  # exact over the packed corpus
    full = q @ corpus.T
    ref_i = np.argsort(-full, axis=1)[:, :20]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref_i)])
    assert overlap >= 17, overlap  # int4 quantization noise
    s2, i2 = idx.search(q, 20, mode="serve")  # CPU: exact fallback
    np.testing.assert_array_equal(i, i2)


def test_flat_int4_device_slabs():
    rng = np.random.default_rng(4)
    corpus, q = _data(rng, n=512)
    idx = FlatIPIndex(64, dtype="int4", block_size=128)
    idx.add_device(jnp.asarray(corpus[:256]))
    idx.add_device(jnp.asarray(corpus[256:]))
    assert len(idx) == 512
    s, i = idx.search(q, 15)
    v, sc = quantize_int4_device(jnp.asarray(corpus), block_rows=128)
    deq = np.asarray(dequantize_int4(v, sc))
    ref_i = np.argsort(-(q @ deq.T), axis=1)[:, :15]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref_i)])
    assert overlap >= 14.5, overlap


def test_flat_int4_save_load_bit_identical(tmp_path):
    rng = np.random.default_rng(5)
    corpus, q = _data(rng, n=300)
    idx = FlatIPIndex(64, dtype="int4", block_size=128)
    idx.add_device(jnp.asarray(corpus))
    idx.docid = [f"d{i}" for i in range(300)]
    s0, i0 = idx.search(q, 10)
    path = str(tmp_path / "sq4")
    idx.save(path)
    idx2 = FlatIPIndex.load(path)
    assert idx2.dtype == "int4" and len(idx2) == 300
    v1 = np.asarray(idx._device_slabs[0][0][:300])
    v2 = np.asarray(idx2._device_slabs[0][0][:300])
    np.testing.assert_array_equal(v1, v2)  # no requantization on load
    s1, i1 = idx2.search(q, 10)
    np.testing.assert_array_equal(i0, i1)
    assert idx2.docid == idx.docid
