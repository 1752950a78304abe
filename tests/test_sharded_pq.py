"""Sharded PQ index (parallel/sharded_pq.py) on the virtual 8-device mesh.

Pins: (a) exact-ADC parity vs the single-device PQIndex (shared codebooks
make the per-row reconstructions identical, so the global ranking must
match), (b) serve mode (exact-ADC fallback off-TPU) agreeing with exact,
(c) the factory strings PQ{M} / OPQ{M},PQ{M} on a mesh, (d) save -> load
roundtrip through load_sharded_index, (e) mode-contract errors.  Reference
analog: sharded-corpus eval (DRT/trainer/trainer.py:191-262) composed with
``faiss.index_factory("PQ96")`` (evaluator/index.py:47-54).
"""

import numpy as np
import pytest

import jax

from denseretrievaltoolkits_tpu.index.pq import PQIndex
from denseretrievaltoolkits_tpu.index.transforms import TransformedIndex
from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
from denseretrievaltoolkits_tpu.parallel.sharded_ivf import (
    load_sharded_index,
    sharded_index_factory,
)
from denseretrievaltoolkits_tpu.parallel.sharded_pq import ShardedPQIndex

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs a multi-device mesh")

DIM, M = 128, 16


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(16, DIM)).astype(np.float32)
    corpus = np.concatenate(
        [c + 0.15 * rng.normal(size=(300, DIM)).astype(np.float32)
         for c in centers])
    rng.shuffle(corpus)  # 4800 rows; shard cuts must not align with clusters
    queries = corpus[rng.choice(len(corpus), 32, replace=False)] \
        + 0.05 * rng.normal(size=(32, DIM)).astype(np.float32)

    single = PQIndex(DIM, M=M)
    single.train(corpus[:2048], iters=4)
    mesh = make_mesh(jax.device_count(), 1)
    shard = ShardedPQIndex(mesh, DIM, M=M)
    shard.codebooks = single.codebooks  # identical codebooks -> same codes
    shard._set_codebooks()
    single.add(corpus)
    shard.add(corpus)
    return corpus, queries, single, shard


def test_exact_parity_vs_single_device(setup):
    corpus, queries, single, shard = setup
    s1, i1 = single.search(queries, 50, mode="exact")
    s2, i2 = shard.search(queries, 50, mode="exact")
    # identical reconstructions -> identical score multisets; ids may swap
    # only among exactly-tied scores (same-code rows)
    np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1),
                               atol=1e-4)
    # selected candidates must score identically under the single-device ADC
    rec = np.asarray(single.reconstruct(np.arange(len(corpus))))
    for q in range(4):
        exact_scores = queries[q] @ rec.T
        np.testing.assert_allclose(
            np.sort(exact_scores[i1[q]]), np.sort(exact_scores[i2[q]]),
            atol=1e-3)


def test_serve_mode_agrees_with_exact(setup):
    _, queries, _, shard = setup
    s_e, i_e = shard.search(queries, 20, mode="exact")
    s_s, i_s = shard.search(queries, 20, mode="approx")  # alias -> serve
    np.testing.assert_allclose(np.sort(s_e, axis=1), np.sort(s_s, axis=1),
                               atol=1e-4)


def test_mode_contract(setup):
    _, queries, _, shard = setup
    for bad in ("partial", "i8q", "nonsense"):
        with pytest.raises(ValueError):
            shard.search(queries, 5, mode=bad)


def test_factory_strings_on_mesh(setup):
    corpus, queries, _, _ = setup
    mesh = make_mesh(jax.device_count(), 1)
    idx = sharded_index_factory(mesh, DIM, f"PQ{M}")
    assert isinstance(idx, ShardedPQIndex) and not idx.is_trained
    idx.train(corpus[:2048], iters=3)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    assert s.shape == (32, 10)

    chained = sharded_index_factory(mesh, DIM, f"OPQ{M},PQ{M}")
    assert isinstance(chained, TransformedIndex)
    assert isinstance(chained.inner, ShardedPQIndex)


def test_save_load_roundtrip(tmp_path, setup):
    corpus, queries, _, shard = setup
    path = str(tmp_path / "spq")
    shard.save(path)
    mesh = make_mesh(jax.device_count(), 1)
    loaded = load_sharded_index(path, mesh)
    assert isinstance(loaded, ShardedPQIndex)
    assert len(loaded) == len(shard)
    s1, i1 = shard.search(queries, 25, mode="exact")
    s2, i2 = loaded.search(queries, 25, mode="exact")
    np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1),
                               atol=1e-4)


def test_add_chunks_streaming(setup):
    corpus, queries, _, shard = setup
    mesh = make_mesh(jax.device_count(), 1)
    idx = ShardedPQIndex(mesh, DIM, M=M)
    idx.codebooks = shard.codebooks
    idx._set_codebooks()
    calls = []

    def chunk_fn(start, rows):
        calls.append((start, rows))
        return corpus[start:start + rows]

    idx.add_chunks(chunk_fn, len(corpus), chunk_rows=1000)
    assert len(calls) == 5 and len(idx) == len(corpus)
    s1, i1 = shard.search(queries, 10, mode="exact")
    s2, i2 = idx.search(queries, 10, mode="exact")
    np.testing.assert_allclose(np.sort(s1, axis=1), np.sort(s2, axis=1),
                               atol=1e-4)
