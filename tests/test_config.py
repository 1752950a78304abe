"""Config dataclass triple: defaults, __post_init__ normalization, parsing modes."""

import json

from denseretrievaltoolkits_tpu.config import (
    DataArguments,
    ModelArguments,
    RRTrainingArguments,
    TrainingArguments,
    parse_args,
)


def test_dataset_name_normalization():
    d = DataArguments(dataset_name="Tevatron/wikipedia-nq")
    assert d.dataset_name == "Tevatron/wikipedia-nq"
    assert d.dataset_split == "train"
    d = DataArguments(dataset_name="Tevatron/wikipedia-nq/dev")
    assert d.dataset_name == "Tevatron/wikipedia-nq"
    assert d.dataset_split == "dev"
    d = DataArguments(dataset_name="mrtydi:arabic")
    assert d.dataset_name == "mrtydi"
    assert d.dataset_language == "arabic"
    d = DataArguments()
    assert d.dataset_name == "json" and d.data_path is None


def test_data_dir_scan(tmp_path):
    for split in ("train", "dev", "test"):
        (tmp_path / f"{split}.jsonl").write_text("{}\n")
    d = DataArguments(data_dir=str(tmp_path))
    assert set(d.data_path) == {"train", "dev", "test"}


def test_training_args_derived_dirs(tmp_path):
    t = TrainingArguments(output_dir=str(tmp_path / "out"), cache_train_dir=str(tmp_path / "cache"))
    assert t.retrieve_dir.endswith("retrieve")
    assert t.index_order_dir.endswith("idx")
    assert (tmp_path / "cache" / "retrieve").is_dir()
    assert t.topk_list == [5, 10, 20]


def test_save_per_train_clamp(tmp_path):
    t = TrainingArguments(cache_train_dir=str(tmp_path), max_epochs=3, save_per_train=10)
    assert t.save_per_train == 3


def test_rr_training_args(tmp_path):
    t = RRTrainingArguments(cache_train_dir=str(tmp_path))
    assert t.loss_fn == "mr" and t.margin == 1.0


def test_parse_cli(tmp_path):
    m, d, t = parse_args(
        args=[
            "--model_name_or_path", "bert-base-uncased",
            "--untie_encoder",
            "--q_max_len", "16",
            "--cache_train_dir", str(tmp_path),
            "--train_batch_size", "8",
            "--topk", "5,10",
        ]
    )
    assert m.untie_encoder and d.q_max_len == 16 and t.train_batch_size == 8
    assert t.topk_list == [5, 10]


def test_parse_json_file(tmp_path):
    cfg = {
        "model_name_or_path": "bert-base-uncased",
        "pooling": "mean",
        "p_max_len": 156,
        "cache_train_dir": str(tmp_path),
        "optimizer": "adamw",
    }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(cfg))
    m, d, t = parse_args(args=[str(path)])
    assert m.pooling == "mean" and d.p_max_len == 156 and t.optimizer == "adamw"
