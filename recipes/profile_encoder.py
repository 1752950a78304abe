"""Ablation profile of the encoder hot path on the real TPU.

Decomposes bench.py's encode/train conditions (bert-base, B=256, S=156,
bf16) into measurable pieces so optimization targets the real bottleneck
instead of FLOP guesses:

  1. full encode forward (the bench_encode condition)
  2. per-layer scaling (12 vs 2 layers -> marginal layer cost + fixed cost)
  3. isolated attention inner (einsum QK -> softmax -> einsum PV), the part a
     flash-attention kernel would replace, vs jax's Pallas flash_attention
     on the same shapes (padded to its 128-block granularity)
  4. isolated MLP + projection matmuls at the same shapes (MXU ceiling check)
  5. train step split: forward-only vs value_and_grad vs full optimizer step

Usage:  python recipes/profile_encoder.py            # on the TPU
        JAX_PLATFORMS=cpu python ... --smoke         # CPU shape check

Writes results to results/profile_encoder.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny shapes on CPU")
    ap.add_argument("--out", default="results/profile_encoder.json")
    args = ap.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        B, S, iters = 8, 156, 2
    else:
        B, S, iters = 256, 156, 20

    from denseretrievaltoolkits_tpu.models.bert import BertConfig, bert_encode, init_params

    res = {}

    def record(name, ms, note=""):
        res[name] = round(ms, 3)
        print(f"{name:42s} {ms:9.3f} ms  {note}", flush=True)

    # -- 1/2: full encode + layer scaling --------------------------------
    cfg12 = BertConfig() if not args.smoke else BertConfig(
        vocab_size=512, hidden_size=128, num_hidden_layers=12,
        num_attention_heads=4, intermediate_size=512)
    cfg2 = BertConfig(**{**cfg12.__dict__, "num_hidden_layers": 2})
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg12.vocab_size, size=(B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    p12 = init_params(jax.random.key(0), cfg12)
    p2 = init_params(jax.random.key(0), cfg2)
    enc = jax.jit(lambda p, c=cfg12: bert_encode(p, c, ids, mask, compute_dtype=jnp.bfloat16))
    enc2 = jax.jit(lambda p, c=cfg2: bert_encode(p, c, ids, mask, compute_dtype=jnp.bfloat16))
    ms12 = timeit(enc, p12, iters=iters)
    ms2 = timeit(enc2, p2, iters=iters)
    record("encode_12L", ms12, f"{B * 1000.0 / ms12:.0f} passages/s")
    record("encode_2L", ms2)

    if not args.smoke:
        encf = jax.jit(lambda p: bert_encode(
            p, cfg12, ids, mask, compute_dtype=jnp.bfloat16, attention="flash"))
        out_x = np.asarray(enc(p12), np.float32)
        out_f = np.asarray(encf(p12), np.float32)
        err = float(np.max(np.abs(out_x - out_f)))
        msf = timeit(encf, p12, iters=iters)
        record("encode_12L_flash", msf,
               f"{B * 1000.0 / msf:.0f} passages/s, max|Δ| vs xla {err:.2e}")
        # the seq-160-native single-block kernel (ops/attn.py, VERDICT r4 #5)
        encfu = jax.jit(lambda p: bert_encode(
            p, cfg12, ids, mask, compute_dtype=jnp.bfloat16, attention="fused"))
        out_fu = np.asarray(encfu(p12), np.float32)
        err_fu = float(np.max(np.abs(out_x - out_fu)))
        msfu = timeit(encfu, p12, iters=iters)
        record("encode_12L_fused", msfu,
               f"{B * 1000.0 / msfu:.0f} passages/s, max|Δ| vs xla {err_fu:.2e}")
    per_layer = (ms12 - ms2) / 10.0
    record("per_layer_marginal", per_layer, "(12L-2L)/10")
    record("fixed_cost", ms2 - 2 * per_layer, "embed+LN+dispatch")

    H, nh = cfg12.hidden_size, cfg12.num_attention_heads
    hd = H // nh
    F = cfg12.intermediate_size

    # -- 3: attention inner, XLA vs flash --------------------------------
    kq = jax.random.normal(jax.random.key(1), (B, S, nh, hd), jnp.bfloat16)
    kk = jax.random.normal(jax.random.key(2), (B, S, nh, hd), jnp.bfloat16)
    kv = jax.random.normal(jax.random.key(3), (B, S, nh, hd), jnp.bfloat16)
    mask_bias = jnp.zeros((B, 1, 1, S), jnp.float32)

    def attn_xla(q, k, v):
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(hd) + mask_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.bfloat16)

    ms_attn = timeit(jax.jit(attn_xla), kq, kk, kv, iters=iters)
    record("attn_inner_xla_x12", ms_attn * 12, f"one layer {ms_attn:.3f}")

    if not args.smoke:
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

            Sp = 256  # flash blocks need 128-multiples; pad S=156 -> 256
            pad = Sp - S
            qf = jnp.pad(kq, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            kf = jnp.pad(kk, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            vf = jnp.pad(kv, ((0, 0), (0, pad), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
            seg = jnp.pad(jnp.ones((B, S), jnp.int32), ((0, 0), (0, pad)))
            from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

            fa = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, segment_ids=SegmentIds(seg, seg), sm_scale=1.0 / math.sqrt(hd)))
            ms_flash = timeit(fa, qf, kf, vf, iters=iters)
            record("attn_inner_flash_x12", ms_flash * 12,
                   f"one layer {ms_flash:.3f} (padded S={Sp})")
        except Exception as e:  # noqa: BLE001
            print(f"flash_attention unavailable: {e}", flush=True)

    # -- 4: MXU ceiling at the block's matmul shapes ----------------------
    x2d = jax.random.normal(jax.random.key(4), (B * S, H), jnp.bfloat16)
    wqkv = jax.random.normal(jax.random.key(5), (H, 3 * H), jnp.bfloat16)
    wo = jax.random.normal(jax.random.key(6), (H, H), jnp.bfloat16)
    wi = jax.random.normal(jax.random.key(7), (H, F), jnp.bfloat16)
    wod = jax.random.normal(jax.random.key(8), (F, H), jnp.bfloat16)

    def proj_mlp(x):
        a = jnp.dot(x, wqkv, preferred_element_type=jnp.bfloat16)
        b = jnp.dot(x, wo, preferred_element_type=jnp.bfloat16)
        h = jnp.dot(x, wi, preferred_element_type=jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        return a[:, :H] + b + jnp.dot(h, wod, preferred_element_type=jnp.bfloat16)

    ms_mm = timeit(jax.jit(proj_mlp), x2d, iters=iters)
    flops = 2 * B * S * (H * 3 * H + H * H + 2 * H * F)
    record("proj_mlp_matmuls_x12", ms_mm * 12,
           f"one layer {ms_mm:.3f} = {flops / ms_mm / 1e9:.0f} TFLOP/s")

    # -- 5: train step split ----------------------------------------------
    if not args.smoke:
        import optax

        from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec

        model = DRModel(DRModelSpec(bert_config=cfg12, dtype="bfloat16"))
        params = model.init_params(jax.random.key(0))
        qb = {"input_ids": jnp.asarray(rng.integers(1, cfg12.vocab_size, (32, S)), jnp.int32),
              "attention_mask": jnp.ones((32, S), jnp.int32)}
        pb = {"input_ids": jnp.asarray(rng.integers(1, cfg12.vocab_size, (64, S)), jnp.int32),
              "attention_mask": jnp.ones((64, S), jnp.int32)}

        fwd = jax.jit(lambda p: model.forward(p, qb, pb)["loss"])
        record("train_forward_only", timeit(fwd, params, iters=10))

        def grad_probe(model_):
            # Sum the grads into the output so XLA cannot dead-code-eliminate
            # the backward pass (returning loss alone DCEs it entirely).
            def f(p):
                loss, g = jax.value_and_grad(
                    lambda pp: model_.forward(pp, qb, pb)["loss"])(p)
                return loss + 1e-30 * sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return jax.jit(f)

        record("train_value_and_grad", timeit(grad_probe(model), params, iters=10))

        model_f = DRModel(DRModelSpec(bert_config=cfg12, dtype="bfloat16",
                                      attention="flash"))
        try:
            record("train_value_and_grad_flash",
                   timeit(grad_probe(model_f), params, iters=10),
                   "(flash custom VJP)")
        except Exception as e:  # noqa: BLE001
            print(f"flash backward failed: {e}", flush=True)

        opt = optax.adamw(1e-5)
        opt_state = opt.init(params)

        def full(p, s):
            loss, g = jax.value_and_grad(lambda pp: model.forward(pp, qb, pb)["loss"])(p)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        fj = jax.jit(full, donate_argnums=(0, 1))
        # donation: re-init state each call would defeat timing; chain instead
        for _ in range(2):
            params, opt_state, loss = fj(params, opt_state)
        jax.block_until_ready(loss)
        t0 = time.time()
        for _ in range(10):
            params, opt_state, loss = fj(params, opt_state)
        jax.block_until_ready(loss)
        record("train_full_step", (time.time() - t0) / 10 * 1e3)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"B": B, "S": S, **res}, fh, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
