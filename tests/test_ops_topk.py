"""Pallas top-k kernel (interpret mode on CPU) vs numpy exact search."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from denseretrievaltoolkits_tpu.ops.topk import _pallas_block_topj, pallas_topk


def test_block_topj_matches_numpy():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(512, 128)).astype(np.float32)
    q = rng.normal(size=(8, 128)).astype(np.float32)
    vals, ids = _pallas_block_topj(jnp.asarray(q), jnp.asarray(corpus), 4, 256, 512)
    # raw per-block layout is [n_blocks, J, Q] (J in the sublane dim — the
    # lane dim would pad J to 128 and blow up HBM writes 20x+)
    vals, ids = np.asarray(vals), np.asarray(ids)
    full = q @ corpus.T
    for b in range(2):
        blk = full[:, b * 256 : (b + 1) * 256]
        ref_idx = np.argsort(-blk, axis=1)[:, :4] + b * 256
        np.testing.assert_array_equal(ids[b], ref_idx.T)
        ref_val = -np.sort(-blk, axis=1)[:, :4]
        np.testing.assert_allclose(vals[b], ref_val.T, atol=1e-4)


def test_block_topj_masks_padding():
    rng = np.random.default_rng(1)
    corpus = np.zeros((256, 128), np.float32)
    corpus[:100] = rng.normal(size=(100, 128))
    corpus[100:] = 100.0  # huge scores in the padded region must be masked
    q = rng.normal(size=(8, 128)).astype(np.float32)
    vals, ids = _pallas_block_topj(jnp.asarray(q), jnp.asarray(corpus), 4, 256, 100)
    assert np.asarray(ids).max() < 100


def test_pallas_topk_exact_random():
    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(3000, 64)).astype(np.float32)
    q = rng.normal(size=(9, 64)).astype(np.float32)
    s, i = pallas_topk(q, jnp.asarray(corpus), k=25, block_size=512)
    full = q @ corpus.T
    ref_s = -np.sort(-full, axis=1)[:, :25]
    np.testing.assert_allclose(s, ref_s, atol=1e-4)


def test_pallas_topk_adversarial_clustered():
    """All top-k in one block: the certificate must trigger the fallback."""
    n = 2048
    vals = np.linspace(1, 0, n).astype(np.float32)
    corpus = vals[:, None] * np.ones((1, 64), np.float32)
    q = np.ones((8, 64), np.float32)
    s, i = pallas_topk(q, jnp.asarray(corpus), k=30, block_size=512)
    for r in range(8):
        assert sorted(i[r].tolist()) == list(range(30))


def test_pallas_topk_k_larger_than_candidates():
    rng = np.random.default_rng(3)
    corpus = rng.normal(size=(600, 32)).astype(np.float32)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    s, i = pallas_topk(q, jnp.asarray(corpus), k=100, block_size=512)
    full = q @ corpus.T
    ref_s = -np.sort(-full, axis=1)[:, : s.shape[1]]
    np.testing.assert_allclose(s, ref_s, atol=1e-4)


def test_pallas_topk_escalation_path():
    """A block holding more top-k members than J triggers J-escalation (not
    the full exact fallback) and still returns exact results."""
    rng = np.random.default_rng(9)
    n, d, k = 4096, 32, 64  # default J=8, 4*J=32 < k → escalation eligible
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    # plant 20 near-identical strong docs inside ONE block (rows 100..119)
    strong = rng.normal(size=(1, d)).astype(np.float32) * 3
    corpus[100:120] = strong + 0.01 * rng.normal(size=(20, d)).astype(np.float32)
    q = (strong + 0.05 * rng.normal(size=(3, d))).astype(np.float32)
    s, i = pallas_topk(q, jnp.asarray(corpus), k=k, block_size=512)
    full = q @ corpus.T
    ref_s = -np.sort(-full, axis=1)[:, :k]
    np.testing.assert_allclose(s, ref_s, atol=1e-3)


def test_flat_index_save_after_add_device(tmp_path):
    from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex

    rng = np.random.default_rng(10)
    corpus = rng.normal(size=(200, 16)).astype(np.float32)
    idx = FlatIPIndex(16, dtype="int8", block_size=64)
    idx.add_device(jnp.asarray(corpus))
    idx.docid = [f"d{i}" for i in range(200)]
    path = str(tmp_path / "dev" / "flat")
    idx.save(path)
    loaded = FlatIPIndex.load(path)
    assert len(loaded) == 200 and loaded.docid == idx.docid
    q = rng.normal(size=(2, 16)).astype(np.float32)
    s1, i1 = idx.search(q, 10)
    s2, i2 = loaded.search(q, 10)
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i1, i2)])
    assert overlap >= 8  # int8 roundtrip keeps ranking


def test_quantize_int8_device_interpret():
    from denseretrievaltoolkits_tpu.ops.quant import dequantize_int8, quantize_int8_device

    rng = np.random.default_rng(12)
    reps = rng.normal(size=(300, 64)).astype(np.float32)
    values, scales = quantize_int8_device(jnp.asarray(reps), block_rows=128)
    assert values.shape == (300, 64) and scales.shape == (300,)
    recon = np.asarray(dequantize_int8(values, scales))
    # per-row error bounded by scale/2 = absmax/254
    row_bound = np.abs(reps).max(axis=1) / 127
    assert (np.abs(recon - reps).max(axis=1) <= row_bound + 1e-6).all()


def test_pallas_topk_small_corpus_full_k():
    """Corpora with fewer candidate slots than k route to the exact scan and
    return the full k columns (regression: silent truncation to nb*J)."""
    rng = np.random.default_rng(13)
    corpus = rng.normal(size=(100, 64)).astype(np.float32)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    s, i = pallas_topk(q, jnp.asarray(corpus), k=50, block_size=512)
    assert i.shape == (3, 50)
    full = q @ corpus.T
    np.testing.assert_array_equal(i, np.argsort(-full, axis=1)[:, :50])


def test_pallas_topk_jit_scaled_matches_dequant():
    """The fully-jitted int8 serving path (kernel + merge, no certificate)
    must match exact search over the dequantized corpus."""
    from denseretrievaltoolkits_tpu.index.flat import quantize_int8
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_jit_scaled

    rng = np.random.default_rng(7)
    corpus = rng.normal(size=(1024, 64)).astype(np.float32)
    values, scales = quantize_int8(corpus)
    q = rng.normal(size=(8, 64)).astype(np.float32)
    s, i = pallas_topk_jit_scaled(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
        10, 10, 256, 1024,
    )
    s, i = np.asarray(s), np.asarray(i)
    deq = values.astype(np.float32) * scales[:, None]
    full = q @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, -np.sort(-full, axis=1)[:, :10], rtol=2e-2, atol=1e-2)


def test_packed_kernel_matches_exact_selection():
    """Packed-selection serving kernel: indices must match numpy exact top-k
    (no near-ties in random data), scores within the pack quantum."""
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve

    rng = np.random.default_rng(11)
    corpus = rng.normal(size=(2048, 64)).astype(np.float32)
    # include negative-heavy rows so the sortable-int transform's negative
    # branch is exercised
    corpus[:512] -= 3.0
    q = rng.normal(size=(8, 64)).astype(np.float32)
    q[3] = -np.abs(q[3])  # queries producing mostly negative scores
    s, i = pallas_topk_serve(jnp.asarray(q), jnp.asarray(corpus), 10, 10, 256, 2048)
    s, i = np.asarray(s), np.asarray(i)
    full = q @ corpus.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    ref_s = -np.sort(-full, axis=1)[:, :10]
    np.testing.assert_allclose(s, ref_s, rtol=1e-3, atol=1e-3)
    # quantization rounds toward -inf: packed score never exceeds the truth
    assert (s <= ref_s + 1e-6).all()


def test_packed_kernel_masks_padding():
    from denseretrievaltoolkits_tpu.ops.topk import _pallas_block_topj_packed

    rng = np.random.default_rng(12)
    corpus = np.zeros((512, 64), np.float32)
    corpus[:300] = rng.normal(size=(300, 64))
    corpus[300:] = 50.0  # padded region must never win
    q = rng.normal(size=(8, 64)).astype(np.float32)
    vals, ids = _pallas_block_topj_packed(
        jnp.asarray(q), jnp.asarray(corpus), 4, 256, 300
    )
    vals, ids = np.asarray(vals), np.asarray(ids)
    # block 0 fully valid; block 1 has 44 valid rows then padding
    assert ids[0].max() < 256
    real = (vals > -1e29)
    assert (ids[real] < 300).all()
    assert np.isfinite(vals[real]).all() and not np.isnan(vals).any()


def test_packed_scaled_kernel_matches_dequant():
    """int8 packed serving path vs exact search over the dequantized corpus."""
    from denseretrievaltoolkits_tpu.index.flat import quantize_int8
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_serve_scaled

    rng = np.random.default_rng(13)
    corpus = rng.normal(size=(1024, 64)).astype(np.float32)
    corpus[:256] -= 2.0  # negative-score region
    values, scales = quantize_int8(corpus)
    q = rng.normal(size=(8, 64)).astype(np.float32)
    s, i = pallas_topk_serve_scaled(
        jnp.asarray(q), jnp.asarray(values), jnp.asarray(scales),
        10, 10, 256, 1024,
    )
    s, i = np.asarray(s), np.asarray(i)
    deq = values.astype(np.float32) * scales[:, None]
    full = q @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    ref_s = -np.sort(-full, axis=1)[:, :10]
    np.testing.assert_allclose(s, ref_s, rtol=2e-3, atol=2e-3)


def test_packed_i8q_kernel_matches_dequant():
    """Native-int8 serve kernel (s8·s8→s32) vs exact search over the
    dequantized corpus. Queries are constructed int8-representable so
    quantize_queries is lossless and the comparison is deterministic."""
    from denseretrievaltoolkits_tpu.index.flat import quantize_int8
    from denseretrievaltoolkits_tpu.ops.topk import (
        pallas_topk_serve_i8q, quantize_queries)

    rng = np.random.default_rng(15)
    corpus = rng.normal(size=(1024, 64)).astype(np.float32)
    corpus[:256] -= 2.0  # negative-score region
    values, scales = quantize_int8(corpus)
    q_int = rng.integers(-127, 128, size=(8, 64)).astype(np.float32)
    q_int[:, 0] = 127.0  # pin per-row amax so the quantizer scale is exact
    q = q_int * 0.037
    qi, qs = quantize_queries(jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(qi), q_int.astype(np.int8))
    s, i = pallas_topk_serve_i8q(
        qi, jnp.asarray(values), jnp.asarray(scales), qs, 10, 10, 256, 1024,
    )
    s, i = np.asarray(s), np.asarray(i)
    deq = values.astype(np.float64) * scales[:, None]
    full = q.astype(np.float64) @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    ref_s = -np.sort(-full, axis=1)[:, :10]
    np.testing.assert_allclose(s, ref_s, rtol=2e-3, atol=2e-3)


def test_packed_sq4_i8q_kernel_matches_dequant():
    """Native-int8 sq4 serve kernel vs exact search over the dequantized
    nibble-packed corpus (same lossless-query construction)."""
    from denseretrievaltoolkits_tpu.ops.quant import dequantize_int4, quantize_int4_device
    from denseretrievaltoolkits_tpu.ops.topk import (
        pallas_topk_serve_sq4_i8q, quantize_queries)

    rng = np.random.default_rng(16)
    corpus = rng.normal(size=(512, 64)).astype(np.float32)
    packed, scales = quantize_int4_device(jnp.asarray(corpus))
    q_int = rng.integers(-127, 128, size=(8, 64)).astype(np.float32)
    q_int[:, 0] = 127.0
    q = q_int * 0.021
    qi, qs = quantize_queries(jnp.asarray(q))
    s, i = pallas_topk_serve_sq4_i8q(
        qi, packed, jnp.asarray(scales), qs, 10, 10, 256, 512,
    )
    s, i = np.asarray(s), np.asarray(i)
    deq = np.asarray(dequantize_int4(packed, scales)).astype(np.float64)
    full = q.astype(np.float64) @ deq.T
    ref_i = np.argsort(-full, axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref_i)
    ref_s = -np.sort(-full, axis=1)[:, :10]
    np.testing.assert_allclose(s, ref_s, rtol=2e-3, atol=2e-3)


def test_pallas_topk_fast_i8_native_toggle():
    """The serving wrapper reaches both the native-int8 and cast-to-bf16
    kernels for int8/int4 corpora; both rankings track the dequantized exact
    ranking on well-separated data."""
    from denseretrievaltoolkits_tpu.index.flat import quantize_int8
    from denseretrievaltoolkits_tpu.ops.quant import quantize_int4_device
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_fast

    rng = np.random.default_rng(17)
    corpus = rng.normal(size=(777, 48)).astype(np.float32)
    q = rng.normal(size=(5, 48)).astype(np.float32)
    values, scales = quantize_int8(corpus)
    deq = values.astype(np.float64) * scales[:, None]
    ref = np.argsort(-(q.astype(np.float64) @ deq.T), axis=1)[:, :20]
    for native in (True, False):
        s, i = pallas_topk_fast(q, jnp.asarray(values), 20, block_size=256,
                                scales=jnp.asarray(scales), i8_native=native)
        overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref)])
        assert overlap >= 18.5, (native, overlap)

    packed, scales4 = quantize_int4_device(jnp.asarray(corpus))
    deq4 = None
    from denseretrievaltoolkits_tpu.ops.quant import dequantize_int4
    deq4 = np.asarray(dequantize_int4(packed, scales4)).astype(np.float64)
    ref4 = np.argsort(-(q.astype(np.float64) @ deq4.T), axis=1)[:, :20]
    for native in (True, False):
        s, i = pallas_topk_fast(q, packed, 20, block_size=256,
                                scales=jnp.asarray(scales4), int4=True,
                                i8_native=native)
        overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ref4)])
        assert overlap >= 18.0, (native, overlap)


def test_flat_index_approx_mode_quantized():
    """mode='approx' on int8/int4 indexes: off-TPU it falls back to the exact
    scan; the call path (and result sanity) is covered either way."""
    from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex

    rng = np.random.default_rng(18)
    corpus = rng.normal(size=(300, 32)).astype(np.float32)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    for dtype in ("int8", "int4"):
        idx = FlatIPIndex(32, dtype=dtype, block_size=128)
        idx.add(corpus)
        s, i = idx.search(q, 10, mode="approx")
        se, ie = idx.search(q, 10, mode="exact")
        overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i, ie)])
        assert overlap >= 9.0, (dtype, overlap)


def test_pallas_topk_fast_wrapper():
    """High-level serving wrapper: padding/J/tq handling, bf16 + int8 paths,
    tiny-corpus fallback; parity with numpy exact on random data."""
    from denseretrievaltoolkits_tpu.index.flat import quantize_int8
    from denseretrievaltoolkits_tpu.ops.topk import pallas_topk_fast

    rng = np.random.default_rng(14)
    corpus = rng.normal(size=(777, 48)).astype(np.float32)  # non-multiple size
    q = rng.normal(size=(5, 48)).astype(np.float32)
    full = q @ corpus.T
    ref_i = np.argsort(-full, axis=1)[:, :20]

    s, i = pallas_topk_fast(q, jnp.asarray(corpus), 20, block_size=256)
    np.testing.assert_array_equal(i, ref_i)
    assert s.shape == (5, 20)

    values, scales = quantize_int8(corpus)
    s8, i8 = pallas_topk_fast(q, jnp.asarray(values), 20, block_size=256,
                              scales=jnp.asarray(scales))
    deq = values.astype(np.float32) * scales[:, None]
    ref8 = np.argsort(-(q.astype(np.float32) @ deq.T), axis=1)[:, :20]
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(i8, ref8)])
    assert overlap >= 19.0, overlap  # bf16 query cast may flip near-ties

    # tiny corpus: exact-scan fallback, k > rows clamps
    s2, i2 = pallas_topk_fast(q, jnp.asarray(corpus[:40]), 64, block_size=256)
    assert i2.shape == (5, 40)


def test_flat_index_serve_mode_cpu_fallback():
    """mode='serve' off-TPU falls back to the exact scan path."""
    from denseretrievaltoolkits_tpu.index.flat import FlatIPIndex

    rng = np.random.default_rng(15)
    corpus = rng.normal(size=(300, 32)).astype(np.float32)
    idx = FlatIPIndex(corpus, block_size=64)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    s, i = idx.search(q, 10, mode="serve")
    ref = np.argsort(-(q @ corpus.T), axis=1)[:, :10]
    np.testing.assert_array_equal(i, ref)


def test_safe_block_caps():
    """VMEM-safe block caps: 4096 at dim 768 fails to compile on hardware, so
    index-default block sizes must be clamped before reaching the kernels."""
    from denseretrievaltoolkits_tpu.ops.topk import safe_block

    assert safe_block(768, jnp.bfloat16, 4096) == 2048
    assert safe_block(768, jnp.int8, 4096) == 2048
    assert safe_block(768, jnp.float32, 4096) == 1024
    assert safe_block(128, jnp.float32, 4096) == 4096  # small dims keep 4096
    assert safe_block(768, jnp.bfloat16, 512) == 512   # never raises a request
    assert safe_block(32, jnp.float32, 64) == 64
