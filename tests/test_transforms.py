"""PCA/PCAR vector transforms + TransformedIndex factory chains.

The reference reaches FAISS's transform-prefixed factory strings
("PCAR64,SQ8", ...) through FaissRetriever (DRT/evaluator/index.py:47-54);
index/transforms.py is the TPU-native equivalent (matmul projection)."""

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex, index_factory
from denseretrievaltoolkits_tpu.index.ivf import IVFFlatIndex
from denseretrievaltoolkits_tpu.index.transforms import PCATransform, TransformedIndex


def _lowrank_corpus(rng, n, dim, rank):
    z = rng.normal(size=(n, rank)).astype(np.float32)
    basis, _ = np.linalg.qr(rng.normal(size=(dim, rank)))
    return z @ basis.T.astype(np.float32)


def test_factory_parses_transform_chains():
    idx = index_factory(64, "PCAR16,SQ8")
    assert isinstance(idx, TransformedIndex)
    assert idx.transform.d_out == 16 and idx.transform.rotate
    assert idx.inner.dtype == "int8" and not idx.is_trained

    idx2 = index_factory(64, "PCA32,IVF8,Flat")
    assert isinstance(idx2.inner, IVFFlatIndex)
    assert idx2.inner.nlist == 8 and not idx2.transform.rotate

    with pytest.raises(ValueError):
        index_factory(64, "PCAR0,Flat")


def test_full_rank_rotation_preserves_scores():
    """d_out == dim: the transform is orthogonal, so IP scores are exact."""
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(300, 32)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)

    idx = index_factory(32, "PCAR32,Flat")
    idx.train(corpus)
    idx.add(corpus)
    s, i = idx.search(q, 10)

    full = q @ corpus.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, np.take_along_axis(full, ref_i, axis=1),
                               rtol=1e-4, atol=1e-4)


def test_lowrank_projection_high_recall():
    """Corpus spanning a rank-8 subspace: PCA16 captures it, recall ~1."""
    rng = np.random.default_rng(1)
    corpus = _lowrank_corpus(rng, 500, 96, rank=8)
    q = _lowrank_corpus(rng, 6, 96, rank=8) + corpus[:6] * 0.1

    idx = index_factory(96, "PCAR16,Flat")
    idx.train(corpus)
    idx.add(corpus)
    s, i = idx.search(q, 10)

    full = q @ corpus.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref_i)])
    assert overlap >= 9.0, overlap


def test_transform_requires_train():
    idx = index_factory(32, "PCAR8,Flat")
    with pytest.raises(AssertionError):
        idx.add(np.zeros((4, 32), np.float32))


def test_transformed_int8_chain_and_docids():
    rng = np.random.default_rng(2)
    corpus = _lowrank_corpus(rng, 400, 64, rank=8)
    idx = index_factory(64, "PCAR16,SQ8")
    idx.train(corpus)
    idx.add(corpus)
    idx.docid = [f"d{i}" for i in range(400)]
    q = corpus[:3] + 0.01 * rng.normal(size=(3, 64)).astype(np.float32)
    s, i = idx.search(q, 5)
    assert i.shape == (3, 5)
    # int8 chain tracks exact search in the projected space
    proj_c = np.asarray(idx.transform.apply(corpus))
    proj_q = np.asarray(idx.transform.apply(q))
    ref_i = np.argsort(-(proj_q @ proj_c.T), axis=1)[:, :5]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref_i)])
    assert overlap >= 4.0, overlap
    assert idx.docid[0] == "d0" and len(idx) == 400


def test_transformed_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    corpus = _lowrank_corpus(rng, 200, 48, rank=8)
    idx = index_factory(48, "PCAR16,SQ8")
    idx.train(corpus)
    idx.add(corpus)
    idx.docid = [f"d{i}" for i in range(200)]
    q = corpus[:4]
    s0, i0 = idx.search(q, 8)

    path = str(tmp_path / "tidx")
    idx.save(path)
    idx2 = TransformedIndex.load(path)
    np.testing.assert_array_equal(idx2.transform.matrix, idx.transform.matrix)
    s1, i1 = idx2.search(q, 8)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)
    assert idx2.docid == idx.docid


def test_transformed_ivf_chain():
    rng = np.random.default_rng(4)
    corpus = _lowrank_corpus(rng, 600, 64, rank=8)
    idx = index_factory(64, "PCA16,IVF16,Flat")
    idx.train(corpus)
    idx.add(corpus)
    q = corpus[:4] + 0.01 * rng.normal(size=(4, 64)).astype(np.float32)
    s, i = idx.search(q, 5, nprobe=16)  # full probe: exact in projected space
    proj_c = np.asarray(idx.transform.apply(corpus))
    proj_q = np.asarray(idx.transform.apply(q))
    ref_i = np.argsort(-(proj_q @ proj_c.T), axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(ref_i, axis=1))
