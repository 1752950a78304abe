#!/usr/bin/env python
"""Offline encoding CLI: corpus/query shards → pickled (reps, lookup) files.

The reference declares the encode flags (``DRT/arguments.py:107-112``:
encode_in_path / encode_is_qry / encode_num_shard / encode_shard_index and the
``do_encode`` toggle, :176) but ships no encode entry (its ``run_toolkits.py``
is missing, run.sh:4).  This CLI provides that capability: stream a jsonl/HF
dataset shard through the query or passage tower and save pickle
``(reps, lookup)`` shards consumable by the offline retrieval CLI
(evaluator/retrieval.py).
"""

import logging
import pickle

import numpy as np

from denseretrievaltoolkits_tpu.config import (
    DataArguments,
    ModelArguments,
    TrainingArguments,
    parse_args,
)

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger(__name__)


def main(argv=None):
    import jax

    model_args, data_args, training_args = parse_args(
        (ModelArguments, DataArguments, TrainingArguments), args=argv
    )

    from denseretrievaltoolkits_tpu.utils.runtime import setup_runtime

    setup_runtime(training_args)

    from datasets import load_dataset

    from denseretrievaltoolkits_tpu.data.collators import EncodeCollator
    from denseretrievaltoolkits_tpu.data.loaders import DataLoader, pad_to_batch
    from denseretrievaltoolkits_tpu.data.preprocess import (
        CorpusPreProcessor,
        QueryPreProcessor,
    )
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel
    from denseretrievaltoolkits_tpu.utils.tokenization import load_tokenizer

    tokenizer = load_tokenizer(model_args)
    model, params = DRModel.build(model_args, rng=jax.random.key(training_args.seed))

    if not data_args.encode_in_path:
        raise SystemExit("--encode_in_path is required")
    ds = load_dataset(
        "json", data_files=list(data_args.encode_in_path),
        cache_dir=data_args.data_cache_dir,
    )["train"].shard(data_args.encode_num_shard, data_args.encode_shard_index)

    if data_args.encode_is_qry:
        pre = QueryPreProcessor(tokenizer, data_args.q_max_len)
        collator = EncodeCollator(tokenizer, q_max_len=data_args.q_max_len)
        encode_fn = jax.jit(model.encode_query)
        save_path = data_args.encodedq_save_path
    else:
        pre = CorpusPreProcessor(tokenizer, data_args.p_max_len,
                                 data_args.passage_field_separator)
        # --bucketed_encode: per-batch bucket padding over a length-sorted
        # iteration (data/collators.bucket_length) — the (reps, lookup)
        # pickle is order-aligned by construction, so downstream consumers
        # (evaluator/retrieval.py p_lookup) are unaffected
        step = (data_args.bucket_step
                if getattr(data_args, "bucketed_encode", False) else 0)
        collator = EncodeCollator(tokenizer, p_max_len=data_args.p_max_len,
                                  bucket_step=step)
        encode_fn = jax.jit(model.encode_passage)
        save_path = data_args.encodedp_save_path
    if not save_path:
        raise SystemExit("--encodedq_save_path / --encodedp_save_path is required")

    ds = ds.map(pre, batched=False, remove_columns=ds.column_names,
                desc="Tokenizing")
    # EncodeCollator keys off query_id / doc_id
    key = "query_id" if data_args.encode_is_qry else "doc_id"

    def norm(sample):
        if key not in sample:
            sample = dict(sample)
            sample[key] = sample.pop("id", None) or sample.get("query_id")
        return sample

    sort = None
    if getattr(data_args, "bucketed_encode", False) and not data_args.encode_is_qry:
        sort = lambda ex: len(ex["text"]) + 2  # noqa: E731

    loader = DataLoader(
        [norm(r) for r in ds],
        training_args.corpus_batch_size,
        collator,
        shuffle=False,
        sort_by_length=sort,
    )

    lookup, reps = [], []
    bs = loader.batch_size
    for ids, batch in loader:
        padded, valid = pad_to_batch(batch, bs)
        out = np.asarray(encode_fn(params, padded))[:valid]
        reps.append(out)
        lookup.extend(ids)
    reps = np.concatenate(reps, axis=0)
    with open(save_path, "wb") as fh:
        pickle.dump((reps, lookup), fh)
    logger.info("encoded %d items (dim %d) -> %s", reps.shape[0], reps.shape[1], save_path)


if __name__ == "__main__":
    main()
