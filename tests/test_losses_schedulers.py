"""Losses and LR schedules vs hand-computed / reference-formula values."""

import numpy as np
import pytest

from denseretrievaltoolkits_tpu.train.losses import (
    binary_cross_entropy_loss,
    contrastive_loss,
    cross_entropy_loss,
    margin_ranking_loss,
    soft_margin_ranking_loss,
    stride_targets,
)
from denseretrievaltoolkits_tpu.train.schedulers import (
    constant_schedule,
    cosine_schedule,
    inverse_sqrt_schedule,
    linear_schedule,
)


def _softmax_ce(scores, target):
    s = scores - scores.max()
    logp = s - np.log(np.exp(s).sum())
    return -logp[target]


def test_stride_targets():
    # 2 queries, 8 passages -> stride 4: targets [0, 4]
    # matches reference biencoder.py:109-114 / losses.py:13-15
    np.testing.assert_array_equal(np.asarray(stride_targets(2, 8)), [0, 4])
    np.testing.assert_array_equal(np.asarray(stride_targets(3, 6)), [0, 2, 4])


def test_contrastive_loss_hand_computed():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 4)).astype(np.float32)
    p = rng.normal(size=(6, 4)).astype(np.float32)
    loss, scores = contrastive_loss(q, p)
    ref_scores = q @ p.T
    np.testing.assert_allclose(np.asarray(scores), ref_scores, atol=1e-5)
    expected = np.mean([_softmax_ce(ref_scores[0], 0), _softmax_ce(ref_scores[1], 3)])
    np.testing.assert_allclose(float(loss), expected, atol=1e-5)


def test_rr_losses_hand_computed():
    pos = np.array([[2.0], [0.5]], np.float32)
    neg = np.array([[1.0], [1.5]], np.float32)
    # margin ranking: mean(relu(1 - pos + neg)) = mean([0, 2.0]) = 1.0
    np.testing.assert_allclose(float(margin_ranking_loss(pos, neg, 1.0)), 1.0, atol=1e-6)
    # soft margin: mean(softplus(1 - pos + neg))
    expected = np.mean(np.log1p(np.exp([0.0, 2.0])))
    np.testing.assert_allclose(float(soft_margin_ranking_loss(pos, neg, 1.0)), expected, atol=1e-5)
    # bce: -log(sigmoid(pos)).mean() - log(1-sigmoid(neg)).mean()
    sig = lambda x: 1 / (1 + np.exp(-x))
    expected = (-np.log(sig(pos))).mean() + (-np.log(1 - sig(neg))).mean()
    np.testing.assert_allclose(float(binary_cross_entropy_loss(pos, neg)), expected, atol=1e-5)


def test_rr_ce_loss_two_way():
    pos = np.array([[0.2, 1.2]], np.float32)  # [neg_logit, pos_logit]
    neg = np.array([[0.8, 0.1]], np.float32)
    expected = _softmax_ce(pos[0], 1) + _softmax_ce(neg[0], 0)
    np.testing.assert_allclose(float(cross_entropy_loss(pos, neg)), expected, atol=1e-5)


# --- schedules: reference DRT/trainer/scheduler.py:65-133 formulas -------


def _ref_warmup(n, init_lr, max_lr, w):
    return init_lr + (max_lr - init_lr) / w * n


@pytest.mark.parametrize("step", [1, 5, 10, 11, 50, 1000])
def test_inverse_sqrt(step):
    init_lr, max_lr, w = 0.0, 1e-3, 10
    s = inverse_sqrt_schedule(init_lr, max_lr, w)
    if step <= w:
        expected = _ref_warmup(step, init_lr, max_lr, w)
    else:
        expected = max_lr * (w ** 0.5) * step ** -0.5
    np.testing.assert_allclose(float(s(step)), expected, rtol=1e-6)


@pytest.mark.parametrize("step", [1, 10, 11, 55, 100])
def test_cosine(step):
    init_lr, max_lr, w, m = 0.0, 1e-3, 10, 100
    s = cosine_schedule(init_lr, max_lr, w, m)
    if step <= w:
        expected = _ref_warmup(step, init_lr, max_lr, w)
    else:
        expected = init_lr + (max_lr - init_lr) / 2 * (1 + np.cos(np.pi / (m - w) * (step - w)))
    np.testing.assert_allclose(float(s(step)), expected, rtol=1e-5)


@pytest.mark.parametrize("step", [1, 10, 11, 55, 100])
def test_linear(step):
    init_lr, max_lr, w, m = 0.0, 1e-3, 10, 100
    s = linear_schedule(init_lr, max_lr, w, m)
    if step <= w:
        expected = _ref_warmup(step, init_lr, max_lr, w)
    else:
        expected = max_lr - (max_lr - init_lr) / (m - w) * (step - w)
    np.testing.assert_allclose(float(s(step)), expected, rtol=1e-5)


def test_constant():
    s = constant_schedule(0.0, 1e-3, 10)
    np.testing.assert_allclose(float(s(5)), 0.5e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3, rtol=1e-6)


def test_trainer_derives_warmup_from_ratio(tmp_path):
    """warmup_ratio fills n_warmup_steps/max_steps from the training horizon
    when the scheduler kwargs leave them out (reference arguments.py:174
    declared the flag and never used it)."""
    import jax
    from denseretrievaltoolkits_tpu.config import TrainingArguments
    from denseretrievaltoolkits_tpu.models.bert import BertConfig
    from denseretrievaltoolkits_tpu.models.biencoder import DRModel, DRModelSpec
    from denseretrievaltoolkits_tpu.train.trainer import Trainer

    class _Loader:
        def __len__(self):
            return 50

        def __iter__(self):
            return iter(())

    args = TrainingArguments(
        output_dir=str(tmp_path / "o"), cache_train_dir=str(tmp_path / "c"),
        max_epochs=4, scheduler="linear", warmup_ratio=0.1,
        learning_rate=1e-3, log_every=0,
    )
    tiny = BertConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      max_position_embeddings=16)
    model = DRModel(DRModelSpec(bert_config=tiny))
    params = model.init_params(jax.random.key(0))
    Trainer(args, model, params, train_loader=_Loader())
    assert args.scheduler_kwargs["n_warmup_steps"] == 20  # 0.1 * 200
    assert args.scheduler_kwargs["max_steps"] == 200

    # explicit kwargs are never overridden
    args2 = TrainingArguments(
        output_dir=str(tmp_path / "o2"), cache_train_dir=str(tmp_path / "c2"),
        max_epochs=4, scheduler="linear", warmup_ratio=0.1,
        scheduler_kwargs={"n_warmup_steps": 7, "max_steps": 99},
        learning_rate=1e-3, log_every=0,
    )
    Trainer(args2, model, params, train_loader=_Loader())
    assert args2.scheduler_kwargs["n_warmup_steps"] == 7
    assert args2.scheduler_kwargs["max_steps"] == 99
