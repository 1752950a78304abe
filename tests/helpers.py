"""Shared test fixtures: a local offline tokenizer and tiny synthetic datasets."""

import json
import os

WORDS = (
    "what is the capital of france germany italy spain paris berlin rome madrid "
    "city big small river mountain who wrote book novel author famous year came "
    "when did war end start president country north south east west red blue "
    "green ocean sea lake dog cat bird fish tree house king queen money gold"
).split()


def make_tokenizer(tmp_path):
    """A real BertTokenizerFast over a tiny local vocab (no network)."""
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    vocab_file = os.path.join(str(tmp_path), "vocab.txt")
    with open(vocab_file, "w") as fh:
        fh.write("\n".join(vocab))
    return BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)


def _sent(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def make_exactmatch_dataset(tmp_path, rng, n_train=16, n_eval=8, n_corpus=64, n_neg=4):
    """Synthetic NQ-style jsonl splits + corpus in the Tevatron schema.

    Each query's answer word appears in its positive passage and in the
    corresponding corpus doc, so retrieval metrics are meaningful.
    """
    data_dir = os.path.join(str(tmp_path), "data")
    os.makedirs(data_dir, exist_ok=True)

    corpus_rows = []
    for i in range(n_corpus):
        corpus_rows.append(
            {"docid": f"d{i}", "title": _sent(rng, 2), "text": _sent(rng, 12)}
        )

    def make_split(n, start):
        rows = []
        for j in range(n):
            i = (start + j) % n_corpus
            answer = WORDS[rng.randrange(len(WORDS))]
            # plant the answer inside the corpus doc + positive passage
            corpus_rows[i]["text"] = corpus_rows[i]["text"] + " " + answer
            pos = {"docid": f"d{i}", "title": corpus_rows[i]["title"],
                   "text": corpus_rows[i]["text"]}
            negs = []
            for _ in range(n_neg):
                k = rng.randrange(n_corpus)
                negs.append({"docid": f"d{k}", "title": corpus_rows[k]["title"],
                             "text": corpus_rows[k]["text"]})
            rows.append(
                {
                    "query_id": f"q{start + j}",
                    "query": _sent(rng, 5) + " " + answer,
                    "answers": [answer],
                    "positive_passages": [pos],
                    "negative_passages": negs,
                }
            )
        return rows

    splits = {
        "train": make_split(n_train, 0),
        "dev": make_split(n_eval, n_train),
        "test": make_split(n_eval, n_train + n_eval),
    }
    for name, rows in splits.items():
        with open(os.path.join(data_dir, f"{name}.jsonl"), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    corpus_path = os.path.join(str(tmp_path), "corpus.jsonl")
    with open(corpus_path, "w") as fh:
        for r in corpus_rows:
            fh.write(json.dumps(r) + "\n")
    return data_dir, corpus_path, splits, corpus_rows
