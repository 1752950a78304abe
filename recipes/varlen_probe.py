#!/usr/bin/env python
"""Instrumented re-run of the bucketed-encode arm (VERDICT r4 weak #2).

Runs the EXACT bench_encode_varlen workload twice in one session, logging
per-arm wall time, per-bucket widths and batch counts, compile time per
distinct shape, and the measured host->device transfer share, to decide
whether the r04 1.01x reading (vs the claimed 1.91x) was a measurement
artifact (relay stall / on-clock recompile) or a real regression.
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _bert_base_model, _roundtrip
    from denseretrievaltoolkits_tpu.data.collators import pad_batch

    config, model, params = _bert_base_model()
    encode = jax.jit(model.encode_passage)
    rng = np.random.default_rng(0)
    N, B, MAXL = 16384, 256, 156
    lens = np.clip(np.exp(rng.normal(4.25, 0.55, N)), 16, MAXL).astype(int)
    seqs = [rng.integers(1, config.vocab_size, L).tolist() for L in lens]

    fixed = [pad_batch(seqs[i:i + B], MAXL, 0) for i in range(0, N, B)]
    order = np.argsort(lens, kind="stable")
    sseqs = [seqs[i] for i in order]
    bucketed = [pad_batch(sseqs[i:i + B], MAXL, 0, bucket_step=32)
                for i in range(0, N, B)]
    from collections import Counter
    widths = Counter(b["input_ids"].shape[1] for b in bucketed)
    print(f"# bucket widths -> batch counts: {dict(sorted(widths.items()))}",
          flush=True)
    # token-count ratio = the theoretical ceiling for the bucketed win
    tok_fixed = sum(b["input_ids"].size for b in fixed)
    tok_buck = sum(b["input_ids"].size for b in bucketed)
    print(f"# padded tokens: fixed {tok_fixed} bucketed {tok_buck} "
          f"(ceiling {tok_fixed / tok_buck:.2f}x)", flush=True)

    def run(batches, tag):
        seen = set()
        t0 = time.time()
        for b in batches:
            shape = b["input_ids"].shape
            if shape not in seen:
                seen.add(shape)
                encode(params, b).block_until_ready()
        print(f"#   [{tag}] compile {len(seen)} shapes in "
              f"{time.time() - t0:.1f}s", flush=True)
        rt = _roundtrip()
        t0 = time.time()
        outs = [encode(params, b) for b in batches]
        jax.block_until_ready(outs)
        el = time.time() - t0 - rt
        print(f"#   [{tag}] {el:.2f}s on clock (rt {rt * 1e3:.0f} ms) "
              f"-> {N / el:.0f} p/s", flush=True)
        return N / el

    for trial in range(3):
        pf = run(fixed, f"t{trial} fixed")
        pb = run(bucketed, f"t{trial} bucketed")
        print(f"# trial {trial}: fixed {pf:.0f} bucketed {pb:.0f} "
              f"ratio {pb / pf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
