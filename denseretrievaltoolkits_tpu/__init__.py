"""denseretrievaltoolkits_tpu: TPU-native dense retrieval framework (JAX/XLA/Pallas/pjit)."""

__version__ = "0.1.0"

from denseretrievaltoolkits_tpu.config import (  # noqa: F401
    DataArguments,
    ModelArguments,
    RRTrainingArguments,
    TrainingArguments,
    parse_args,
)


def __getattr__(name):
    """Lazy heavyweight exports (keeps `import denseretrievaltoolkits_tpu` cheap)."""
    lazy = {
        "DRModel": "denseretrievaltoolkits_tpu.models.biencoder",
        "DRModelSpec": "denseretrievaltoolkits_tpu.models.biencoder",
        "DRModelForInference": "denseretrievaltoolkits_tpu.models.biencoder",
        "RRModel": "denseretrievaltoolkits_tpu.models.reranker",
        "RRModelSpec": "denseretrievaltoolkits_tpu.models.reranker",
        "Trainer": "denseretrievaltoolkits_tpu.train.trainer",
        "RRTrainer": "denseretrievaltoolkits_tpu.train.trainer",
        "FlatIPIndex": "denseretrievaltoolkits_tpu.index.flat",
        "index_factory": "denseretrievaltoolkits_tpu.index.flat",
        "IVFFlatIndex": "denseretrievaltoolkits_tpu.index.ivf",
        "PCATransform": "denseretrievaltoolkits_tpu.index.transforms",
        "TransformedIndex": "denseretrievaltoolkits_tpu.index.transforms",
        "ShardedFlatIndex": "denseretrievaltoolkits_tpu.parallel.sharded_index",
        "make_mesh": "denseretrievaltoolkits_tpu.parallel.mesh",
        "DenseMiner": "denseretrievaltoolkits_tpu.mine.miner",
        "BertConfig": "denseretrievaltoolkits_tpu.models.bert",
        "T5Config": "denseretrievaltoolkits_tpu.models.t5",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
