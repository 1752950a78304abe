"""Reproduces the BASELINE.md "PCAR384,SQ4 at 8.8M" row on hardware.

PCAR384,SQ4 at 8.8M: the sub-4-bit-effective point (384 dims x 4 bits /
768 original dims = 2 bits/dim). Data: the bench's clustered mixture with a
power-law column spectrum lambda_j=(j+1)^-0.35 (isotropic gaussians have no
principal subspace; real embedding spectra decay, which is what makes PCAR
meaningful). Reference ranking: exact-int8 (J=16 packed) over the original
768-dim rows."""
import sys, time
import numpy as np
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from bench import _make_centers, _clustered_chunk, _roundtrip, DIM, TOPK
import jax, jax.numpy as jnp
from denseretrievaltoolkits_tpu.ops.quant import quantize_int8_device, quantize_int4_device
from denseretrievaltoolkits_tpu.ops.topk import (
    pallas_topk_serve_scaled, pallas_topk_serve_sq4, pallas_topk_serve_sq4_i8q,
    quantize_queries)

N = 8_800_000
NQ = 2048
DOUT = 384
block = 2048
lam = jnp.asarray((np.arange(DIM) + 1.0) ** -0.35, jnp.float32)
centers = _make_centers()

def place_fn(bv, bs, cv, cs, off):
    return (jax.lax.dynamic_update_slice(bv, cv, (off, 0)),
            jax.lax.dynamic_update_slice(bs, cs, (off,)))
place = jax.jit(place_fn, donate_argnums=(0, 1))

# ---- 1) int8 reference over the original 768-dim spectrumed rows
n = N + ((-N) % block)
values = jnp.zeros((n, DIM), jnp.int8)
scales = jnp.ones((n,), jnp.float32)
off = 0
while off < n:
    rows = min(500_000, n - off)
    chunk = _clustered_chunk(centers, off, rows) * lam[None, :]
    cv, cs = quantize_int8_device(chunk, block_rows=1024)
    chunk.delete()
    values, scales = place(values, scales, cv, cs, off)
    off += rows
values.block_until_ready()
q_np = np.asarray(_clustered_chunk(centers, 10**9, NQ)) * np.asarray(lam)[None, :]
q = jax.device_put(jnp.asarray(q_np, jnp.bfloat16))
ref = pallas_topk_serve_scaled(q, values, scales, TOPK, 16, block, N, tq=512)
ref_ids = np.asarray(ref[1])
print("ref ranking done", ref_ids.shape, flush=True)
# int8 serve qps on this spectrumed corpus (denominator for the PCAR ratio)
rt = _roundtrip()
out = pallas_topk_serve_scaled(q, values, scales, TOPK, 4, block, N, tq=512)
el8 = float("inf")
for _ in range(3):
    t0 = time.time()
    for _ in range(5):
        out = pallas_topk_serve_scaled(q, values, scales, TOPK, 4, block, N, tq=512)
    float(jnp.sum(out[0][0, 0]))
    el8 = min(el8, (time.time() - t0 - rt) / 5)
qps8 = NQ / el8
hits8 = np.mean([len(set(a) & set(b)) / TOPK
                 for a, b in zip(np.asarray(out[1]), ref_ids)])
print(f"int8 serve: {qps8:.0f} qps recall {hits8:.4f}", flush=True)
values.delete(); scales.delete()

# ---- 2) PCA train on a 262k sample
from denseretrievaltoolkits_tpu.index.transforms import PCATransform
sample = np.asarray(_clustered_chunk(centers, 2 * 10**9, 262144) * lam[None, :])
t0 = time.time()
pca = PCATransform(DIM, DOUT, rotate=True)
pca.train(sample)
print(f"pca train {time.time()-t0:.0f}s; kept variance "
      f"{np.sum(np.var(sample @ pca.matrix, axis=0)) / np.sum(np.var(sample, axis=0)):.4f}",
      flush=True)
del sample
W = jnp.asarray(pca.matrix)

# ---- 3) transformed int4 corpus
v4 = jnp.zeros((n, DOUT // 2), jnp.int8)
s4 = jnp.ones((n,), jnp.float32)
off = 0
while off < n:
    rows = min(500_000, n - off)
    chunk = _clustered_chunk(centers, off, rows) * lam[None, :]
    t = jnp.dot(chunk, W, preferred_element_type=jnp.float32)
    chunk.delete()
    cv, cs = quantize_int4_device(t, block_rows=1024)
    t.delete()
    v4, s4 = place(v4, s4, cv, cs, off)
    off += rows
v4.block_until_ready()
print("pcar-sq4 corpus built", v4.shape, flush=True)

qt_f = jnp.dot(jnp.asarray(q_np, jnp.float32), W, preferred_element_type=jnp.float32)
qt = qt_f.astype(jnp.bfloat16)
rt = _roundtrip()
out = pallas_topk_serve_sq4(qt, v4, s4, TOPK, 4, block, N, tq=512)
el = float("inf")
for _ in range(3):
    t0 = time.time()
    for _ in range(5):
        out = pallas_topk_serve_sq4(qt, v4, s4, TOPK, 4, block, N, tq=512)
    float(jnp.sum(out[0][0, 0]))
    el = min(el, (time.time() - t0 - rt) / 5)
ids = np.asarray(out[1])
hits = np.mean([len(set(a) & set(b)) / TOPK for a, b in zip(ids, ref_ids)])
print(f"pcar384-sq4 serve: {NQ/el:.0f} qps ({NQ/el/qps8:.2f}x int8-serve) "
      f"recall@100 {hits:.4f}", flush=True)

# native-int8 variant
qi, qs = quantize_queries(qt_f)
out = pallas_topk_serve_sq4_i8q(qi, v4, s4, qs, TOPK, 4, block, N, tq=512)
eln = float("inf")
for _ in range(3):
    t0 = time.time()
    for _ in range(5):
        out = pallas_topk_serve_sq4_i8q(qi, v4, s4, qs, TOPK, 4, block, N, tq=512)
    float(jnp.sum(out[0][0, 0]))
    eln = min(eln, (time.time() - t0 - rt) / 5)
ids = np.asarray(out[1])
hits_n = np.mean([len(set(a) & set(b)) / TOPK for a, b in zip(ids, ref_ids)])
print(f"pcar384-sq4 native: {NQ/eln:.0f} qps ({NQ/eln/qps8:.2f}x int8-serve) "
      f"recall@100 {hits_n:.4f}", flush=True)
