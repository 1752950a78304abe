"""Utility modules: templates, tsv preprocessors, distributed init, runtime."""

import json
import os

import pytest

from denseretrievaltoolkits_tpu.data.simple_preprocess import (
    SimpleCollectionPreProcessor,
    SimpleTrainPreProcessor,
    fill_template,
    find_all_markers,
)
from denseretrievaltoolkits_tpu.utils.distributed import (
    maybe_initialize_distributed,
    process_shard,
)

from helpers import make_tokenizer


def test_find_all_markers():
    assert find_all_markers("<title> and <text.body>") == ["title", "text.body"]
    assert find_all_markers("no markers") == []


def test_fill_template():
    out = fill_template("<a>: <b.c>", {"a": "x", "b": {"c": 7}})
    assert out == "x: 7"
    with pytest.raises(ValueError):
        fill_template("<missing>", {})
    with pytest.warns(RuntimeWarning):
        assert fill_template("<missing>!", {}, allow_not_found=True) == "!"


def test_simple_collection_preprocessor(tmp_path):
    tok = make_tokenizer(tmp_path)
    pre = SimpleCollectionPreProcessor(tokenizer=tok, max_length=10)
    line = "d42\twhat is the capital\tof france"
    out = json.loads(pre.process_line(line))
    assert out["text_id"] == "d42"
    assert isinstance(out["text"], list) and len(out["text"]) <= 10


def test_simple_train_preprocessor(tmp_path):
    tok = make_tokenizer(tmp_path)
    queries = tmp_path / "queries.tsv"
    queries.write_text("q1\twhat is the capital of france\n")
    collection = tmp_path / "collection.tsv"
    collection.write_text("0\tparis city\tthe capital of france is paris\n"
                          "1\tberlin city\tthe capital of germany is berlin\n")
    pre = SimpleTrainPreProcessor(
        query_file=str(queries), collection_file=str(collection), tokenizer=tok,
        doc_max_len=16, query_max_len=8,
    )
    row = json.loads(pre.process_one(("q1", ["0"], ["1"])))
    assert set(row) == {"query", "positives", "negatives"}
    assert len(row["positives"]) == 1 and len(row["negatives"]) == 1

    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("q1\t0\t0\t1\n")
    assert SimpleTrainPreProcessor.read_qrel(str(qrels)) == {"q1": ["0"]}


def test_distributed_noop_on_single_host(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False
    assert process_shard() == (1, 0)


def test_runtime_setup_compilation_cache(tmp_path):
    from denseretrievaltoolkits_tpu.config import TrainingArguments
    from denseretrievaltoolkits_tpu.utils.runtime import setup_runtime

    args = TrainingArguments(output_dir=str(tmp_path / "o"),
                             cache_train_dir=str(tmp_path / "c"))
    setup_runtime(args)
    assert os.path.isdir(os.path.join(args.cache_train_dir, "jax_cache"))


def test_run_toolkits_dispatch():
    import run_toolkits
    import sys

    old = sys.argv
    try:
        sys.argv = ["run_toolkits.py"]
        with pytest.raises(SystemExit):
            run_toolkits.main()
        sys.argv = ["run_toolkits.py", "bogus_stage"]
        with pytest.raises(SystemExit):
            run_toolkits.main()
    finally:
        sys.argv = old
