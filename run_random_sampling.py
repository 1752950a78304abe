#!/usr/bin/env python
"""Run DPR training with random negative sampling (TPU-native).

Mirror of the reference entry ``run_random_sampling.py:18-62``: parse the
dataclass triple (CLI flags or one JSON file), build tokenizer + DRModel,
pick ExactMatch vs Relevancy dataset by registry, wire loaders, train.

Instead of ``torch.distributed.init_process_group(backend='nccl')``
(reference :59-61) the devices are organized into a
``jax.sharding.Mesh(dp, tp)`` and the train step pjits over it; global
in-batch negatives need no flag — the contrastive loss is computed over the
global batch by construction.
"""

import logging
import sys

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
    from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
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
    # multi-host: each host feeds its slice of the global train batch, and
    # encodes the contiguous corpus window matching its index shards
    # (the reference's DistributedSampler pick, exactmatch_dataloader.py:17-25)
    from denseretrievaltoolkits_tpu.utils.distributed import process_shard

    shard_num, shard_idx = process_shard()
    dataset = dataset_cls(data_args, tokenizer, cache_dir=cache)
    rnd_sampler = RandomSampleNegatives(data_args, seed=training_args.seed)
    corpus = CorpusDataset(data_args, tokenizer, cache)
    dataloader = loader_cls(
        data_args, dataset, tokenizer, rnd_sampler,
        batch_size=batch_size, seed=training_args.seed,
        shard_num=shard_num, shard_idx=shard_idx,
    )
    train_dl, eval_dl, test_dl = dataloader.get_dataloader()
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
        eval_loader=eval_dl, test_loader=test_dl, mesh=mesh,
        label_kind="answers" if is_exactmatch else "docids",
    )
    if training_args.mine_per_train:
        from denseretrievaltoolkits_tpu.mine.miner import DenseMiner

        trainer.miner = DenseMiner(trainer, tokenizer, data_args)
    if training_args.resume_from:
        trainer.load(training_args.resume_from)
    trainer.train()


if __name__ == "__main__":
    main()
