#!/usr/bin/env python
"""Unified pipeline driver: train → encode → retrieve → rerank.

The reference's canonical recipe invokes a ``run_toolkits.py`` that is missing
from its repository (``run.sh:4``).  This provides that entry: one command
dispatching to the individual stages, sharing the config surface.

    python run_toolkits.py train_random  [flags | config.json]
    python run_toolkits.py train_bm25    [flags | config.json]
    python run_toolkits.py rerank        [flags | config.json]
    python run_toolkits.py encode        [flags | config.json]
    python run_toolkits.py retrieve      --query_reps ... --passage_reps ...
    python run_toolkits.py nq_eval       --retrieval ... --topk ...
"""

import sys


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    stage, argv = sys.argv[1], sys.argv[2:]

    if stage == "train_random":
        import run_random_sampling

        run_random_sampling.main(argv)
    elif stage == "train_bm25":
        import run_BM25_negative

        run_BM25_negative.main(argv)
    elif stage == "rerank":
        import run_reranker

        eval_only = "--eval_only" in argv
        argv = [a for a in argv if a != "--eval_only"]
        run_reranker.main(argv, eval_only=eval_only)
    elif stage == "encode":
        import run_encode

        run_encode.main(argv)
    elif stage == "retrieve":
        sys.argv = [sys.argv[0]] + argv
        from denseretrievaltoolkits_tpu.evaluator import retrieval

        retrieval.main()
    elif stage == "nq_eval":
        sys.argv = [sys.argv[0]] + argv
        from denseretrievaltoolkits_tpu.evaluator import nq_eval

        nq_eval.main()
    else:
        raise SystemExit(f"unknown stage {stage!r}\n{__doc__}")


if __name__ == "__main__":
    main()
