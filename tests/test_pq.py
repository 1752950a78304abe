"""Product-quantization subsystem: ops/pq.py + index/pq.py + OPQ transform.

The reference reaches PQ through FAISS factory strings
(``DRT/evaluator/index.py:47-54``); these tests pin the TPU-native
replacement: exact-ADC scores match a numpy ADC oracle bit-for-bit, the fused
decode-and-scan kernel (interpret mode here) matches ADC ranking up to bf16
near-ties, recall against the uncompressed ranking is sane on compressible
data, and the index API (factory, persistence, modes, streaming build)
behaves like the other index families.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denseretrievaltoolkits_tpu.index.flat import index_factory
from denseretrievaltoolkits_tpu.index.io import load_index
from denseretrievaltoolkits_tpu.index.pq import PQIndex
from denseretrievaltoolkits_tpu.index.transforms import (OPQTransform,
                                                         TransformedIndex)
from denseretrievaltoolkits_tpu.ops import pq as pq_ops

# long-running integration file: excluded from the smoke set (pytest -m 'not slow')
pytestmark = pytest.mark.slow

H, M = 256, 32  # d_sub=8 like the production PQ96@768, but test-sized


def _clustered(rng, n, h=H, n_clusters=64, spread=0.25):
    """Compressible corpus: cluster centers + small noise (real embedding
    matrices are low-entropy; pure gaussians are the incompressible worst
    case and make recall assertions meaningless)."""
    centers = rng.standard_normal((n_clusters, h)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + spread * rng.standard_normal((n, h)).astype(np.float32)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(7)
    corpus = _clustered(rng, 6000)
    queries = _clustered(rng, 48)
    cb = pq_ops.pq_train(corpus[:4096], M, iters=6, block_rows=1024)
    codes = np.asarray(
        pq_ops.pq_encode_device(jnp.asarray(corpus), jnp.asarray(cb)))
    return corpus, queries, cb, codes


def test_train_shapes_and_reconstruction(fitted):
    corpus, _, cb, codes = fitted
    assert cb.shape == (M, 256, H // M)
    assert codes.shape == (M, corpus.shape[0]) and codes.dtype == np.int8
    dec = np.asarray(pq_ops.pq_decode(jnp.asarray(codes), jnp.asarray(cb)))
    rel = np.linalg.norm(dec - corpus) / np.linalg.norm(corpus)
    # clustered data compresses well; also must beat an untrained quantizer
    assert rel < 0.35, rel
    rng = np.random.default_rng(0)
    cb_rand = rng.standard_normal(cb.shape).astype(np.float32)
    codes_r = np.asarray(pq_ops.pq_encode_device(jnp.asarray(corpus),
                                                 jnp.asarray(cb_rand)))
    dec_r = np.asarray(pq_ops.pq_decode(jnp.asarray(codes_r),
                                        jnp.asarray(cb_rand)))
    rel_r = np.linalg.norm(dec_r - corpus) / np.linalg.norm(corpus)
    assert rel < 0.5 * rel_r, (rel, rel_r)


def test_exact_adc_matches_numpy_oracle(fitted):
    corpus, queries, cb, codes = fitted
    dec = np.asarray(pq_ops.pq_decode(jnp.asarray(codes), jnp.asarray(cb)))
    s_ref = queries @ dec.T
    order = np.argsort(-s_ref, axis=1)[:, :10]
    s, i = pq_ops.pq_blockwise_topk(jnp.asarray(queries), jnp.asarray(codes),
                                    jnp.asarray(cb), 10, block_size=512)
    s, i = np.asarray(s), np.asarray(i)
    # clustered rows share codes -> exactly tied ADC scores, and numpy/XLA
    # order ties differently; exactness = the SELECTED candidates carry the
    # same oracle scores as the oracle's own selection, and scores agree
    np.testing.assert_allclose(
        np.take_along_axis(s_ref, i, 1),
        np.take_along_axis(s_ref, order, 1), rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        s, np.take_along_axis(s_ref, order, 1), rtol=0, atol=2e-4)


def test_exact_adc_respects_valid_mask(fitted):
    corpus, queries, cb, codes = fitted
    n_valid = 1000
    s, i = pq_ops.pq_blockwise_topk(jnp.asarray(queries), jnp.asarray(codes),
                                    jnp.asarray(cb), 10, block_size=512,
                                    valid=n_valid)
    assert (np.asarray(i) < n_valid).all()


def test_pallas_kernel_matches_adc_ranking(fitted):
    """Interpret-mode run of the fused decode-and-scan kernel: candidate sets
    match exact ADC up to bf16 scoring near-ties; scores agree to bf16 eps."""
    corpus, queries, cb, codes = fitted
    k = 20
    s_ref, i_ref = pq_ops.pq_blockwise_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(cb), k,
        block_size=512)
    s_ref, i_ref = np.asarray(s_ref), np.asarray(i_ref)
    bdcb = jnp.asarray(pq_ops.build_bdcb(cb))
    s, i = pq_ops.pallas_topk_pq_fast(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(cb), bdcb, k,
        block_size=512)
    overlap = np.mean([
        len(set(i[q]) & set(i_ref[q])) / k for q in range(queries.shape[0])])
    assert overlap > 0.9, overlap
    # scores of agreeing members match to bf16 tolerance
    rel = np.abs(s - s_ref) / (np.abs(s_ref) + 1e-6)
    assert np.median(rel) < 2e-2


def test_recall_vs_uncompressed_on_compressible_data(fitted):
    """The PQ serving contract is candidate generation: the true top-10 must
    land inside the ADC top-100 window (the 10@100 convention FAISS benches
    report — fine within-cluster rank order is exactly what 8x-compressed
    codes cannot carry)."""
    corpus, queries, cb, codes = fitted
    s_true = queries @ corpus.T
    true_top = np.argsort(-s_true, axis=1)[:, :10]
    _, i = pq_ops.pq_blockwise_topk(jnp.asarray(queries), jnp.asarray(codes),
                                    jnp.asarray(cb), 100, block_size=512)
    i = np.asarray(i)
    recall = np.mean([
        len(set(i[q]) & set(true_top[q])) / 10
        for q in range(queries.shape[0])])
    assert recall > 0.8, recall


def test_pqindex_api_and_factory(tmp_path, fitted):
    corpus, queries, cb, codes = fitted
    idx = index_factory(H, f"PQ{M}")
    assert isinstance(idx, PQIndex) and not idx.is_trained
    idx.train(corpus[:4096], iters=4)
    idx.add(corpus)
    assert len(idx) == corpus.shape[0]
    s, i = idx.search(queries, 10, mode="exact")
    assert s.shape == (queries.shape[0], 10)
    # add / add_device / add_chunks produce identical code stores
    idx2 = PQIndex(H, M=M)
    idx2.codebooks = idx.codebooks
    idx2._set_codebooks()
    idx2.add_device(jnp.asarray(corpus))
    s2, i2 = idx2.search(queries, 10, mode="exact")
    assert (i == i2).all()
    idx3 = PQIndex(H, M=M)
    idx3.codebooks = idx.codebooks
    idx3._set_codebooks()
    idx3.add_chunks(lambda s0, r: corpus[s0:s0 + r], corpus.shape[0],
                    chunk_rows=1700)
    s3, i3 = idx3.search(queries, 10, mode="exact")
    assert (i == i3).all()
    # batch_search == search
    sb, ib = idx.batch_search(queries, 10, batch_size=17, mode="exact")
    assert (ib == i).all()


def test_pqindex_save_load_roundtrip(tmp_path, fitted):
    corpus, queries, cb, codes = fitted
    idx = PQIndex(H, M=M)
    idx.train(corpus[:4096], iters=4)
    idx.add(corpus[:3000])
    idx.docid = [f"d{j}" for j in range(3000)]
    s, i = idx.search(queries, 10, mode="exact")
    path = os.path.join(tmp_path, "pq_idx")
    idx.save(path)
    idx2 = load_index(path)
    assert isinstance(idx2, PQIndex)
    assert idx2.docid[:3] == ["d0", "d1", "d2"]
    s2, i2 = idx2.search(queries, 10, mode="exact")
    assert (i == i2).all()
    np.testing.assert_allclose(s, s2, atol=1e-5)


def test_pq_mode_contract(fitted):
    corpus, queries, cb, codes = fitted
    idx = PQIndex(H, M=M)
    idx.train(corpus[:4096], iters=4)
    idx.add(corpus[:2000])
    with pytest.raises(ValueError, match="partial"):
        idx.search(queries, 5, mode="partial")
    with pytest.raises(ValueError, match="i8q"):
        idx.search(queries, 5, mode="i8q")
    # approx aliases to serve; off-TPU serve falls back to the exact scan
    s_a, i_a = idx.search(queries, 5, mode="approx")
    s_e, i_e = idx.search(queries, 5, mode="exact")
    assert (i_a == i_e).all()


def test_pq_rejects_bad_geometry():
    with pytest.raises(ValueError, match="divisible"):
        PQIndex(H, M=48 + 1)


def test_pq_non_pallas_geometry_serves_via_exact_adc():
    """dim % 128 != 0 disables only the fused kernel: the index still
    trains/adds/searches (serve falls back to the exact-ADC scan)."""
    rng = np.random.default_rng(5)
    reps = rng.standard_normal((1024, 192)).astype(np.float32)
    idx = PQIndex(192, M=96)  # d_sub=2 divides 128, but 192 % 128 != 0
    assert idx._pallas_geometry is False
    idx.train(reps, iters=3)
    assert idx._bdcb is None
    idx.add(reps)
    q = reps[:8]
    s_serve, i_serve = idx.search(q, 10, mode="serve")
    s_exact, i_exact = idx.search(q, 10, mode="exact")
    np.testing.assert_array_equal(i_serve, i_exact)


def test_opq_beats_plain_pq_on_correlated_data():
    """OPQ's rotation must cut reconstruction error when coordinates are
    correlated (the case PQ's axis-aligned subspace split handles worst)."""
    rng = np.random.default_rng(3)
    n = 4096
    # anisotropic + correlated: low-rank mixing of a few strong directions
    z = rng.standard_normal((n, H)).astype(np.float32)
    scales = np.logspace(0, -2, H).astype(np.float32)
    mix = np.linalg.qr(rng.standard_normal((H, H)))[0].astype(np.float32)
    x = (z * scales) @ mix
    cb = pq_ops.pq_train(x, M, iters=6, block_rows=1024)
    codes = pq_ops.pq_encode_device(jnp.asarray(x), jnp.asarray(cb))
    dec = np.asarray(pq_ops.pq_decode(codes, jnp.asarray(cb)))
    err_plain = np.linalg.norm(dec - x)

    t = OPQTransform(H, M=M, rounds=4, kmeans_iters=3)
    t.train(x)
    # rotation is orthogonal
    rtr = t.matrix @ t.matrix.T
    np.testing.assert_allclose(rtr, np.eye(H), atol=1e-4)
    xr = x @ t.matrix
    cb_r = pq_ops.pq_train(xr, M, iters=6, block_rows=1024)
    codes_r = pq_ops.pq_encode_device(jnp.asarray(xr), jnp.asarray(cb_r))
    dec_r = np.asarray(pq_ops.pq_decode(codes_r, jnp.asarray(cb_r)))
    err_opq = np.linalg.norm(dec_r - xr)
    assert err_opq < 0.9 * err_plain, (err_opq, err_plain)


def test_opq_factory_chain_and_persistence(tmp_path):
    rng = np.random.default_rng(5)
    corpus = _clustered(rng, 4096)
    queries = _clustered(rng, 16)
    chain = index_factory(H, f"OPQ{M},PQ{M}")
    assert isinstance(chain, TransformedIndex)
    assert isinstance(chain.transform, OPQTransform)
    assert not chain.is_trained
    chain.train(corpus)
    chain.add(corpus)
    s, i = chain.search(queries, 10, mode="exact")
    path = os.path.join(tmp_path, "opq_chain")
    chain.save(path)
    chain2 = load_index(path)
    s2, i2 = chain2.search(queries, 10, mode="exact")
    assert (i == i2).all()


def test_pcar_pq_chain():
    """PCAR{d},PQ{M} composes: dim reduction then PQ at the reduced dim."""
    rng = np.random.default_rng(11)
    corpus = _clustered(rng, 4096)
    chain = index_factory(H, "PCAR128,PQ16")
    chain.train(corpus)
    chain.add(corpus)
    queries = corpus[:16]
    s, i = chain.search(queries, 100, mode="exact")
    # 10@100 candidate-window contract (rank order inside a cluster is tied)
    s_true = queries @ corpus.T
    true_top = np.argsort(-s_true, axis=1)[:, :10]
    recall = np.mean([
        len(set(i[q]) & set(true_top[q])) / 10 for q in range(16)])
    assert recall > 0.6, recall


# ---------------------------------------------------------------------------
# 4-bit family (FAISS PQ{M}x4 fast-scan analog): nibble-packed codes,
# 16-centroid subquantizers, 8x cheaper decode
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fitted4():
    rng = np.random.default_rng(9)
    corpus = _clustered(rng, 6000)
    queries = _clustered(rng, 32)
    m4 = 2 * M  # same bytes/row as the 8-bit fixture (M x 8 bits == 2M x 4)
    cb = pq_ops.pq_train(corpus[:4096], m4, iters=6, block_rows=1024, k=16)
    codes = np.asarray(
        pq_ops.pq_encode_device(jnp.asarray(corpus), jnp.asarray(cb)))
    return corpus, queries, cb, codes


def test_pq4_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 16, size=(64, 200)).astype(np.int32)
    even, odd = raw[0::2], raw[1::2]
    packed = jnp.asarray((even | (odd << 4)).astype(np.int8))
    back = np.asarray(pq_ops.pq4_unpack(packed))
    np.testing.assert_array_equal(back, raw)


def test_pq4_shapes_and_decode_parity(fitted4):
    corpus, _, cb, codes = fitted4
    m4 = cb.shape[0]
    assert cb.shape == (m4, 16, H // m4)
    assert codes.shape == (m4 // 2, len(corpus))  # nibble-packed storage
    dec = np.asarray(pq_ops.pq_decode(jnp.asarray(codes), jnp.asarray(cb)))
    # numpy oracle reconstruction from unpacked nibbles
    up = np.asarray(pq_ops.pq4_unpack(jnp.asarray(codes)))
    d = H // m4
    oracle = np.concatenate(
        [cb[m, up[m]] for m in range(m4)], axis=1).reshape(len(corpus), H)
    np.testing.assert_allclose(dec, oracle, atol=1e-5)
    # the 4-bit reconstruction must actually compress (error bounded)
    rel = np.linalg.norm(dec - corpus) / np.linalg.norm(corpus)
    assert rel < 0.9


def test_pq4_exact_adc_matches_numpy_oracle(fitted4):
    corpus, queries, cb, codes = fitted4
    m4 = cb.shape[0]
    up = np.asarray(pq_ops.pq4_unpack(jnp.asarray(codes)))
    recon = np.concatenate(
        [cb[m, up[m]] for m in range(m4)], axis=1).reshape(len(corpus), H)
    oracle_scores = queries @ recon.T
    s, i = pq_ops.pq_blockwise_topk(
        jnp.asarray(queries), jnp.asarray(codes), jnp.asarray(cb), 20, 1000)
    s, i = np.asarray(s), np.asarray(i)
    ref = np.sort(oracle_scores, axis=1)[:, ::-1][:, :20]
    np.testing.assert_allclose(s, ref, atol=1e-3)


def test_pq4_serve_kernel_matches_adc(fitted4):
    corpus, queries, cb, codes = fitted4
    bdcb = jnp.asarray(pq_ops.build_bdcb(cb))
    n = len(corpus)
    block = 500
    pad = (-n) % block
    codes_p = jnp.pad(jnp.asarray(codes), ((0, 0), (0, pad)))
    q = jnp.asarray(np.repeat(queries, 8, axis=0))  # Q=256, tq-divisible
    s_k, i_k = pq_ops.pallas_topk_pq(q, codes_p, bdcb, 10, 10, block, n,
                                     tq=32, nbits=4)
    s_e, i_e = pq_ops.pq_blockwise_topk(q, jnp.asarray(codes),
                                        jnp.asarray(cb), 10, 1000)
    # candidate sets agree up to bf16-scoring near-ties: compare the exact
    # ADC scores of the selected candidates
    m4 = cb.shape[0]
    up = np.asarray(pq_ops.pq4_unpack(jnp.asarray(codes)))
    recon = np.concatenate(
        [cb[m, up[m]] for m in range(m4)], axis=1).reshape(n, H)
    qs = np.asarray(q) @ recon.T
    got = np.take_along_axis(qs, np.asarray(i_k), axis=1)
    ref = np.take_along_axis(qs, np.asarray(i_e), axis=1)
    # bf16 scoring resolves ~2^-8 relative (~0.16 at scores ~40): boundary
    # candidates may swap with exact-ADC neighbors inside that band
    np.testing.assert_allclose(np.sort(got, axis=1), np.sort(ref, axis=1),
                               atol=0.2)


def test_pq4_index_and_factory(tmp_path, fitted4):
    corpus, queries, _, _ = fitted4
    idx = index_factory(H, f"PQ{2 * M}x4")
    assert isinstance(idx, PQIndex) and idx.nbits == 4
    idx.train(corpus[:4096], iters=4)
    idx.add(corpus)
    s, i = idx.search(queries, 100, mode="exact")
    # window contract on compressible data
    oracle = queries @ corpus.T
    otop = np.argsort(-oracle, axis=1)[:, :10]
    rec = np.mean([len(set(i[q, :100]) & set(otop[q])) / 10
                   for q in range(len(queries))])
    assert rec >= 0.5, rec
    p = str(tmp_path / "pq4")
    idx.save(p)
    idx2 = load_index(p)
    assert idx2.nbits == 4
    s2, i2 = idx2.search(queries, 10, mode="exact")
    np.testing.assert_allclose(np.sort(s[:, :10], axis=1),
                               np.sort(s2, axis=1), atol=1e-4)


def test_opq_pq4_chain():
    rng = np.random.default_rng(11)
    corpus = _clustered(rng, 4000)
    chained = index_factory(H, f"OPQ{2 * M}x4,PQ{2 * M}x4")
    assert isinstance(chained, TransformedIndex)
    assert chained.inner.nbits == 4
    assert chained.transform.nbits == 4  # rotation fits against 16-centroid PQ
    chained.train(corpus[:2048])
    chained.add(corpus)
    s, i = chained.search(corpus[:8] + 0.01, k=20)
    assert s.shape == (8, 20)
