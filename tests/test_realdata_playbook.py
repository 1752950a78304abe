"""Real-data dry-run playbook: pin the EXACT published HF dataset schemas.

The canonical data for the reference recipes (`run.sh:13-14,42-43`) are
`Tevatron/wikipedia-nq` (train/dev/test splits) + `xxazz/nq-corpus` (21M
Wikipedia passages), and `Tevatron/msmarco-passage` for the msmarco registry
entry.  This container has zero egress, so the real datasets can never be
fetched here — these tests are the maximum offline de-risking: fixture rows
whose column layout matches the PUBLISHED schemas field-for-field, driven
through the UNCHANGED entry point `run_random_sampling.py`.

Published row shapes pinned here (as consumed by the reference at
`DRT/dataset/preprocess.py:14-27` (positive/negative_passages with
docid/title/text), `:44-45` (docid), `:117` (answers), and
`DRT/dataset/preprocess.py:142-147` (corpus docid/title/text)):

- Tevatron/wikipedia-nq row:
    {"query_id": str, "query": str, "answers": [str],
     "positive_passages": [{"docid": str, "title": str, "text": str}],
     "negative_passages": [{"docid": str, "title": str, "text": str}]}
- xxazz/nq-corpus row:
    {"docid": str, "title": str, "text": str}
- Tevatron/msmarco-passage row: same as wikipedia-nq WITHOUT "answers".

When network is available, the README section "Running on the real data"
gives the exact commands; these fixtures guarantee the column plumbing works
before spending a download.
"""

import glob
import json
import os
import random

import pytest

from denseretrievaltoolkits_tpu.config import DataArguments
from denseretrievaltoolkits_tpu.data.preprocess import (
    CorpusPreProcessor,
    EvalPreProcessor,
    ExactMatchPreProcessor,
    TrainPreProcessor,
)

from helpers import WORDS, make_tokenizer, _sent


# --- literal rows in the published column layout -------------------------

def _wiki_nq_row(rng, i, answer, corpus_rows, extra=True):
    """One Tevatron/wikipedia-nq-shaped train/dev/test row."""
    pos_doc = corpus_rows[i]
    negs = [corpus_rows[rng.randrange(len(corpus_rows))] for _ in range(3)]
    row = {
        "query_id": str(1000 + i),
        "query": _sent(rng, 5) + " " + answer,
        "answers": [answer],
        "positive_passages": [dict(pos_doc)],
        "negative_passages": [dict(n) for n in negs],
    }
    if extra:
        # the hub datasets may grow extra columns; the pipeline must
        # tolerate unknown fields rather than KeyError on them
        row["dataset"] = "nq"
    return row


def _make_published_fixture(tmp_path, n_corpus=24, n_train=12, n_eval=6,
                            answers=True):
    rng = random.Random(7)
    corpus_rows = []
    for i in range(n_corpus):
        corpus_rows.append({
            "docid": str(i),  # nq-corpus docids are numeric strings
            "title": _sent(rng, 2).title(),
            "text": _sent(rng, 14),
        })
    data_dir = os.path.join(str(tmp_path), "published")
    os.makedirs(data_dir, exist_ok=True)
    splits = {"train": n_train, "dev": n_eval, "test": n_eval}
    start = 0
    for name, n in splits.items():
        with open(os.path.join(data_dir, f"{name}.jsonl"), "w") as fh:
            for j in range(n):
                i = (start + j) % n_corpus
                answer = WORDS[rng.randrange(len(WORDS))]
                corpus_rows[i]["text"] += " " + answer
                row = _wiki_nq_row(rng, i, answer, corpus_rows)
                if not answers:
                    del row["answers"]  # msmarco-passage shape
                fh.write(json.dumps(row) + "\n")
        start += n
    corpus_path = os.path.join(str(tmp_path), "nq-corpus.jsonl")
    with open(corpus_path, "w") as fh:
        for r in corpus_rows:
            fh.write(json.dumps(r) + "\n")
    return data_dir, corpus_path, corpus_rows


# --- fast schema-contract tests ------------------------------------------

def test_wikipedia_nq_train_row_contract(tmp_path):
    """TrainPreProcessor consumes the published wikipedia-nq row unchanged."""
    tokenizer = make_tokenizer(tmp_path)
    rng = random.Random(0)
    corpus = [{"docid": str(i), "title": "A Title", "text": _sent(rng, 10)}
              for i in range(4)]
    row = _wiki_nq_row(rng, 0, "everest", corpus)
    out = TrainPreProcessor(tokenizer, 16, 32)(row)
    assert set(out) == {"query", "positives", "negatives"}
    assert isinstance(out["query"], list) and len(out["query"]) <= 16
    assert len(out["positives"]) == 1 and len(out["negatives"]) == 3
    # title + separator + text concat (reference preprocess.py:15)
    assert all(isinstance(p, list) for p in out["positives"])


def test_wikipedia_nq_eval_row_contract(tmp_path):
    tokenizer = make_tokenizer(tmp_path)
    rng = random.Random(0)
    corpus = [{"docid": str(i), "title": "T", "text": _sent(rng, 8)}
              for i in range(4)]
    row = _wiki_nq_row(rng, 2, "kilimanjaro", corpus)
    ev = EvalPreProcessor(tokenizer, 16)(row)
    assert ev["positives_ids"] == ["2"]  # docid strings, not ints
    em = ExactMatchPreProcessor(tokenizer, 16)(row)
    assert em["answers"] == ["kilimanjaro"]
    assert em["original"] == row["query"]


def test_nq_corpus_row_contract(tmp_path):
    """CorpusPreProcessor consumes the published nq-corpus row (docid/title/
    text) and a title-less variant (reference preprocess.py:144 'title' in
    example branch)."""
    tokenizer = make_tokenizer(tmp_path)
    pre = CorpusPreProcessor(tokenizer, 32)
    out = pre({"docid": "42", "title": "Everest", "text": "highest peak"})
    assert out["id"] == "42"
    assert out["original"].startswith("Everest ")
    out2 = pre({"docid": "43", "text": "no title row"})
    assert out2["original"] == "no title row"


def test_msmarco_shaped_rows_load(tmp_path):
    """RelevancyDataset (msmarco registry) loads rows WITHOUT an answers
    column — the published Tevatron/msmarco-passage shape."""
    from denseretrievaltoolkits_tpu.data.datasets import RelevancyDataset

    tokenizer = make_tokenizer(tmp_path)
    data_dir, corpus_path, _ = _make_published_fixture(
        tmp_path, answers=False)
    data_args = DataArguments(
        dataset="msmarco", data_dir=data_dir, corpus_path=corpus_path,
        train_n_passages=2, q_max_len=16, p_max_len=24,
        data_cache_dir=str(tmp_path / "hfcache"),
    )
    ds = RelevancyDataset(data_args, tokenizer,
                          cache_dir=str(tmp_path / "hfcache"))
    train, dev, test = ds.load_train()
    assert len(train) == 12 and len(dev) == 6
    row = train[0]
    assert set(row) >= {"query", "positives", "negatives"}
    # dev rows keep positive docids for judged eval (no answers needed)
    assert "positives_ids" in dev[0]


# --- the dry run: unchanged entry points over the published layout -------

@pytest.fixture(scope="module")
def cli_run(tmp_path_factory):
    """Run run_random_sampling.py ONCE over the published layout; downstream
    tests assert its artifacts and chain the reranker CLI off its dump."""
    import jax

    import run_random_sampling
    from denseretrievaltoolkits_tpu.config import ModelArguments
    from denseretrievaltoolkits_tpu.models.bert import BertConfig
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel

    tmp_path = tmp_path_factory.mktemp("cli")
    tokenizer = make_tokenizer(tmp_path)
    tok_dir = str(tmp_path / "tok")
    tokenizer.save_pretrained(tok_dir)

    # a deploy-format checkpoint the CLI can --model_name_or_path at
    cfg = BertConfig(
        vocab_size=tokenizer.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48,
    )
    model, params = DRModel.build(
        ModelArguments(model_name_or_path=""), rng=jax.random.key(0),
        bert_config=cfg,
    )
    ckpt_dir = str(tmp_path / "init_ckpt")
    model.save(params, ckpt_dir)

    # batch sizes must divide the dp=8 virtual mesh the CLI builds
    data_dir, corpus_path, _ = _make_published_fixture(
        tmp_path, n_train=16, n_eval=8)
    out_dir = str(tmp_path / "out")
    cache_dir = str(tmp_path / "cache")
    common = [
        "--model_name_or_path", ckpt_dir,
        "--tokenizer_name", tok_dir,
        "--dataset", "nq",
        "--data_dir", data_dir,
        "--corpus_path", corpus_path,
        "--data_cache_dir", str(tmp_path / "hfcache"),
        "--train_n_passages", "2",
        "--q_max_len", "16",
        "--p_max_len", "24",
        "--output_dir", out_dir,
        "--train_batch_size", "8",
        "--eval_batch_size", "8",
        "--corpus_batch_size", "8",
        "--max_epochs", "1",
        "--eval_per_train", "1",
        "--save_per_train", "1",
        "--learning_rate", "1e-3",
        "--topk", "1,5",
        "--retrieve_num", "5",
        "--log_every", "0",
    ]
    run_random_sampling.main(common + ["--cache_train_dir", cache_dir])
    return {"tmp": tmp_path, "tok_dir": tok_dir, "ckpt_dir": ckpt_dir,
            "data_dir": data_dir, "corpus_path": corpus_path,
            "cache_dir": cache_dir, "common": common}


def test_run_random_sampling_over_published_schema(cli_run):
    """run_random_sampling.py (unchanged, real CLI argv) over the published
    wikipedia-nq + nq-corpus layout: the full pipeline (train -> corpus
    encode -> index -> search -> answer labeling -> metrics/dumps)."""
    cache_dir = cli_run["cache_dir"]
    # metrics JSON for the post-train test eval + at least one epoch eval
    metric_files = glob.glob(os.path.join(cache_dir, "*_metrics"))
    assert metric_files, f"no metrics dumped under {cache_dir}"
    with open(metric_files[0]) as fh:
        metrics = json.load(fh)
    assert any(k.startswith("MRR@") for k in metrics), metrics
    # retrieval dump (the reranker handoff) exists and rows carry the
    # published-schema answers through to labeling
    dumps = glob.glob(os.path.join(cache_dir, "retrieve", "*.json"))
    assert dumps, "no retrieval dump written"
    with open(dumps[0]) as fh:
        first = json.loads(fh.readline())
    assert {"query_id", "doc_id", "answers"} <= set(first)
    # deploy-format save happened (openmatch manifest layout)
    results = glob.glob(os.path.join(cache_dir, "result*", "openmatch_config.json"))
    assert results, "no deploy checkpoint saved"


@pytest.mark.slow
def test_run_reranker_chains_off_dense_dump(cli_run):
    """The reference's dense->rerank handoff via UNCHANGED CLIs: run_reranker
    consumes run_random_sampling's {cache}/retrieve dump (RRDataset), trains
    one epoch, and dumps RR metrics (reference run_reranker.py:46-51)."""
    import run_reranker
    from denseretrievaltoolkits_tpu.models import bert

    cache_dir = cli_run["cache_dir"]
    # the reranker starts from an arch-only checkpoint (config, random
    # head+tower init) — the reference starts from hub bert-base the same way
    arch_dir = str(cli_run["tmp"] / "rr_arch")
    os.makedirs(arch_dir, exist_ok=True)
    bert.save_config(bert.load_config(cli_run["ckpt_dir"]), arch_dir)
    argv = [a for a in cli_run["common"]]
    argv[argv.index(cli_run["ckpt_dir"])] = arch_dir
    argv += ["--cache_train_dir", cache_dir]  # retrieve dump lives here
    run_reranker.main(argv, eval_only=False)
    rr_metrics = glob.glob(os.path.join(cache_dir, "*_RR_metrics"))
    assert rr_metrics, f"no RR metrics under {cache_dir}"
    with open(rr_metrics[0]) as fh:
        m = json.load(fh)
    assert any(k.startswith("MRR@") for k in m), m
    rr_dumps = glob.glob(os.path.join(cache_dir, "rr", "*.json"))
    assert rr_dumps, "no reranker score dump written"


@pytest.mark.slow
def test_run_bm25_negative_over_published_schema(cli_run):
    """run_BM25_negative.py (unchanged CLI) over the published layout: BM25
    mining (native engine when available) -> train -> full eval."""
    import run_BM25_negative

    bm25_cache = str(cli_run["tmp"] / "bm25_cache")
    argv = [a for a in cli_run["common"]] + [
        "--cache_train_dir", bm25_cache,
    ]
    run_BM25_negative.main(argv)
    metric_files = glob.glob(os.path.join(bm25_cache, "*_metrics"))
    assert metric_files, f"no metrics dumped under {bm25_cache}"
    with open(metric_files[0]) as fh:
        metrics = json.load(fh)
    assert any(k.startswith("Recall@") for k in metrics), metrics
