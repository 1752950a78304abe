#!/usr/bin/env python
"""Train + evaluate the cross-encoder reranker over dense retrieval dumps.

Mirror of the reference entry ``run_reranker.py:17-58``: train the RRModel on
(query, passage) pairs from the ExactMatch train split, then score the dense
retriever's top-k dump (``{cache}/retrieve/*.json``) and compute reranked
metrics.  The reference as committed runs evaluate-only (its ``trainer.train()``
is commented out, :50); here training runs when ``max_epochs > 0`` and
``--eval_only`` reproduces the committed behavior.
"""

import logging

from denseretrievaltoolkits_tpu.config import (
    DataArguments,
    ModelArguments,
    RRTrainingArguments,
    parse_args,
)

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger(__name__)


def main(argv=None, eval_only: bool = False):
    import jax

    model_args, data_args, training_args = parse_args(
        (ModelArguments, DataArguments, RRTrainingArguments), args=argv
    )

    from denseretrievaltoolkits_tpu.utils.runtime import setup_runtime

    setup_runtime(training_args)

    from denseretrievaltoolkits_tpu.data.datasets import ExactMatchDataset, RRDataset
    from denseretrievaltoolkits_tpu.data.loaders import (
        ExactMatchDataloader,
        RerankerDataloader,
    )
    from denseretrievaltoolkits_tpu.data.samplers import RandomSampleNegatives
    from denseretrievaltoolkits_tpu.models.reranker import RRModel
    from denseretrievaltoolkits_tpu.train.trainer import RRTrainer
    from denseretrievaltoolkits_tpu.utils.tokenization import load_tokenizer

    tokenizer = load_tokenizer(model_args)
    rng = jax.random.key(training_args.seed)
    model, params = RRModel.build(
        model_args, data_args, training_args, tokenizer=tokenizer, rng=rng
    )

    cache = data_args.data_cache_dir or model_args.cache_dir
    batch_size = [
        training_args.train_batch_size,
        training_args.eval_batch_size,
        training_args.test_batch_size,
    ]
    from denseretrievaltoolkits_tpu.utils.distributed import process_shard

    shard_num, shard_idx = process_shard()
    dataset = ExactMatchDataset(data_args, tokenizer, cache_dir=cache)
    rnd_sampler = RandomSampleNegatives(data_args, seed=training_args.seed)
    dataloader = ExactMatchDataloader(
        data_args, dataset, tokenizer, rnd_sampler,
        batch_size=batch_size, seed=training_args.seed,
        shard_num=shard_num, shard_idx=shard_idx,
    )
    train_dl = dataloader.get_rr_dataloader()

    eval_dataset = RRDataset(data_args, training_args, tokenizer, cache)
    eval_dl = RerankerDataloader(
        data_args, eval_dataset, tokenizer, batch_size=training_args.eval_batch_size
    ).get_eval_dataloader()

    from denseretrievaltoolkits_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 or training_args.tp_size > 1:
        mesh = make_mesh(training_args.dp_size, training_args.tp_size)
        logger.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)

    trainer = RRTrainer(training_args, model, params, train_loader=train_dl,
                        mesh=mesh)
    if training_args.resume_from:
        trainer.load(training_args.resume_from)
    if not eval_only and training_args.max_epochs > 0:
        for ep in range(trainer.start_epoch, training_args.max_epochs):
            trainer.train_loader.set_epoch(ep)
            losses = [trainer.train_step(b) for b in trainer.train_loader]
            logger.info("epoch %d mean loss %.4f", ep + 1, sum(losses) / max(len(losses), 1))
            if (ep + 1) % training_args.save_per_train == 0:
                trainer.save(ep + 1)
    trainer.evaluate(eval_dl, 3)


if __name__ == "__main__":
    import sys

    eval_only = "--eval_only" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--eval_only"]
    main(argv, eval_only=eval_only)
