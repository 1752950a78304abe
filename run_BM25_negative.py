#!/usr/bin/env python
"""Run DPR training with BM25 hard-negative sampling (TPU-native).

Mirror of the reference entry ``run_BM25_negative.py:15-72``: tokenize the
train split, mine (or load cached) BM25 negatives over the train passage pool,
then train with the mined dataset feeding the train loader.
"""

import logging

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

    from denseretrievaltoolkits_tpu.data.datasets import (
        EXACTMATCH_DATASET,
        CorpusDataset,
        ExactMatchDataset,
        RelevancyDataset,
    )
    from denseretrievaltoolkits_tpu.data.loaders import (
        CorpusDataloader,
        ExactMatchDataloader,
        RelevancyDataloader,
    )
    from denseretrievaltoolkits_tpu.data.samplers import BM25Negatives
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel
    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh
    from denseretrievaltoolkits_tpu.train.trainer import Trainer
    from denseretrievaltoolkits_tpu.utils.tokenization import load_tokenizer

    tokenizer = load_tokenizer(model_args)
    rng = jax.random.key(training_args.seed)
    model, params = DRModel.build(model_args, rng=rng)

    is_exactmatch = data_args.dataset in EXACTMATCH_DATASET
    dataset_cls = ExactMatchDataset if is_exactmatch else RelevancyDataset
    loader_cls = ExactMatchDataloader if is_exactmatch else RelevancyDataloader
    cache = data_args.data_cache_dir or model_args.cache_dir

    batch_size = [
        training_args.train_batch_size,
        training_args.eval_batch_size,
        training_args.test_batch_size,
    ]
    dataset = dataset_cls(data_args, tokenizer, cache_dir=cache)

    # mine hard negatives over the tokenized train passage pool
    # (reference run_BM25_negative.py:53-55)
    bm25_sampler = BM25Negatives(data_args, tokenizer.vocab_size, seed=training_args.seed)
    train_dataset, _, _ = dataset.load_train()
    bm25dataset = bm25_sampler.load_passages(train_dataset)
    logger.info("BM25 negatives ready: %d samples", len(bm25dataset))

    from denseretrievaltoolkits_tpu.utils.distributed import process_shard

    shard_num, shard_idx = process_shard()
    dataloader = loader_cls(
        data_args, dataset, tokenizer, bm25_sampler,
        batch_size=batch_size, seed=training_args.seed,
        shard_num=shard_num, shard_idx=shard_idx,
    )
    _, eval_dl, test_dl = dataloader.get_dataloader()
    train_dl = dataloader.get_bm25dataloader(bm25dataset)

    corpus_dl = None
    if data_args.corpus_path or data_args.corpus_name != "json":
        corpus = CorpusDataset(data_args, tokenizer, cache)
        corpus_dl = CorpusDataloader(
            data_args, corpus, tokenizer, training_args.corpus_batch_size,
            shard_hosts=shard_num > 1,
        ).get_dataloader()

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 or training_args.tp_size > 1:
        mesh = make_mesh(training_args.dp_size, training_args.tp_size)
        logger.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)

    trainer = Trainer(
        training_args, model, params,
        corpus_dataloader=corpus_dl, train_loader=train_dl,
        eval_loader=eval_dl if corpus_dl is not None else None,
        test_loader=test_dl if corpus_dl is not None else None,
        mesh=mesh,
        label_kind="answers" if is_exactmatch else "docids",
    )
    if training_args.resume_from:
        trainer.load(training_args.resume_from)
    trainer.train()


if __name__ == "__main__":
    main()
