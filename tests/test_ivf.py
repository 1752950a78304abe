"""IVF-flat trained index: k-means, recall vs exact, overflow, persistence.

The capability replaces the reference's trained FAISS factory path
(``FaissRetriever``, DRT/evaluator/index.py:47-54)."""

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex, index_factory
from denseretrievaltoolkits_tpu.index.ivf import IVFFlatIndex


def _clustered_corpus(rng, n_clusters=32, per=64, dim=32, spread=0.15):
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    rows = np.concatenate(
        [c + spread * rng.normal(size=(per, dim)).astype(np.float32)
         for c in centers])
    return rows


@pytest.fixture(scope="module")
def ivf_setup():
    rng = np.random.default_rng(0)
    corpus = _clustered_corpus(rng)  # 2048 rows
    queries = corpus[rng.choice(len(corpus), 32, replace=False)] \
        + 0.05 * rng.normal(size=(32, 32)).astype(np.float32)
    index = IVFFlatIndex(32, nlist=32, nprobe=8, query_tile=8)
    index.train(corpus, iters=8)
    index.add(corpus)
    exact = FlatIPIndex(32)
    exact.add(corpus)
    return corpus, queries, index, exact


def test_ivf_requires_train_then_add():
    idx = IVFFlatIndex(8, nlist=4)
    with pytest.raises(RuntimeError):
        idx.add(np.zeros((10, 8), np.float32))
    with pytest.raises(RuntimeError):
        idx.search(np.zeros((1, 8), np.float32), 5)


def test_ivf_recall_vs_exact(ivf_setup):
    corpus, queries, index, exact = ivf_setup
    k = 10
    _, ref = exact.search(queries, k)
    _, got = index.search(queries, k)
    recall = np.mean([len(set(got[i]) & set(ref[i])) / k
                      for i in range(len(queries))])
    assert recall >= 0.95, f"IVF recall {recall:.3f} < 0.95"


def test_ivf_full_probe_is_exact(ivf_setup):
    """nprobe == nlist visits every cell: must equal the flat exact search."""
    corpus, queries, index, exact = ivf_setup
    s_ref, i_ref = exact.search(queries, 5)
    # probe mode: exact fp32 probe scores, so the ranking matches bit-wise
    # (bulk mode's packed selection may reorder within its tie quantum —
    # covered set-wise in test_ivf_bulk.py)
    s_got, i_got = index.search(queries, 5, nprobe=index.nlist, mode="probe")
    np.testing.assert_array_equal(i_got, i_ref)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-4, atol=1e-4)


def test_ivf_exact_mode_covers_all_rows(ivf_setup):
    corpus, queries, index, exact = ivf_setup
    s_ref, i_ref = exact.search(queries, 5)
    s_got, i_got = index.search(queries, 5, mode="exact")
    np.testing.assert_array_equal(i_got, i_ref)


def test_ivf_overflow_slab_preserves_rows():
    """Capacity overflow must spill to the exact slab, not drop rows."""
    rng = np.random.default_rng(1)
    # one dominant direction → heavy skew into few cells
    corpus = rng.normal(size=(512, 16)).astype(np.float32)
    corpus[:400] = corpus[:400] * 0.05 + np.ones(16, np.float32)
    idx = IVFFlatIndex(16, nlist=16, nprobe=16, capacity_factor=1.0)
    idx.train(corpus, iters=5)
    idx.add(corpus)
    stored = int(np.sum(np.asarray(idx._row_ids) >= 0))
    ovf = 0 if idx._ovf_ids is None else int(idx._ovf_ids.shape[0])
    assert stored + ovf == 512
    assert ovf > 0, "skewed corpus should overflow at capacity_factor=1"
    # full probe + overflow = exact
    exact = FlatIPIndex(16)
    exact.add(corpus)
    _, i_ref = exact.search(corpus[:8], 5)
    _, i_got = idx.search(corpus[:8], 5, nprobe=16, mode="probe")
    np.testing.assert_array_equal(i_got, i_ref)


def test_ivf_int8_recall(ivf_setup):
    corpus, queries, index, exact = ivf_setup
    idx8 = IVFFlatIndex(32, nlist=32, nprobe=8, dtype="int8")
    idx8.train(corpus, iters=8)
    idx8.add(corpus)
    k = 10
    _, ref = exact.search(queries, k)
    _, got = idx8.search(queries, k)
    recall = np.mean([len(set(got[i]) & set(ref[i])) / k
                      for i in range(len(queries))])
    assert recall >= 0.9, f"IVF-int8 recall {recall:.3f}"


def test_ivf_save_load_roundtrip(tmp_path, ivf_setup):
    corpus, queries, index, exact = ivf_setup
    index.docid = [f"d{i}" for i in range(len(corpus))]
    path = str(tmp_path / "ivf")
    index.save(path)
    loaded = IVFFlatIndex.load(path)
    assert loaded.docid == index.docid and len(loaded) == len(index)
    s1, i1 = index.search(queries, 10)
    s2, i2 = loaded.search(queries, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_factory_parses_ivf_strings():
    idx = index_factory(64, "IVF256,Flat")
    assert isinstance(idx, IVFFlatIndex)
    assert idx.nlist == 256 and idx.dtype == "float32"
    assert index_factory(64, "IVF128,SQ8").dtype == "int8"
    assert index_factory(64, "ivf32,bf16").dtype == "bfloat16"
    with pytest.raises(ValueError):
        index_factory(64, "IVFx,Flat")
    # PQ joined the factory surface in round 4 (index/pq.py)
    from denseretrievaltoolkits_tpu.index.pq import PQIndex

    assert isinstance(index_factory(64, "PQ16"), PQIndex)
    with pytest.raises(ValueError):
        index_factory(64, "LSH32")  # genuinely unsupported stays an error


def test_add_device_matches_add():
    """Device-native build (add_device on a bf16 device array) produces the
    same search results as the host add() path (both route through the
    on-device bucketing scatter)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    corpus = rng.normal(size=(600, 32)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)

    a = IVFFlatIndex(32, nlist=8, nprobe=8, dtype="float32", query_tile=8)
    a.train(corpus[:256], iters=4)
    a.add(corpus)

    b = IVFFlatIndex(32, nlist=8, nprobe=8, dtype="float32", query_tile=8)
    b.centroids = a.centroids
    b.add_device(jax.device_put(jnp.asarray(corpus)))

    sa, ia = a.search(q, 10, nprobe=8, mode="probe")
    sb, ib = b.search(q, 10, nprobe=8, mode="probe")
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-5)
    # full probe = exact
    ref = np.argsort(-(q @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(ib, ref)
