"""Contrastive and pairwise ranking losses (pure functions, jittable).

Implements the intended semantics of the reference's ``DRT/trainer/losses.py``:

- ``SimpleContrastiveLoss`` (:7-17): in-batch CE over x·yᵀ with stride targets.
- ``DistributedContrastiveLoss`` (:20-40): all_gather then CE ×world_size.  On a
  TPU mesh we compute the loss over the *global* batch inside one pjit step, so
  the gather is a single XLA collective inserted by GSPMD and the ×world_size
  rescale (which only counters DDP's gradient averaging) is unnecessary — the
  global mean is exact.
- Reranker pairwise losses mr/smr/bce/ce (:48-88).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax


def stride_targets(num_queries: int, num_passages: int) -> jnp.ndarray:
    """Target indices: query i's positive is passage i * (P // Q).

    Matches ``biencoder.py:109-114`` (targets = arange(nq) * train_n_passages)
    and ``losses.py:13-15`` (stride = y.size(0) // x.size(0)).
    """
    stride = num_passages // num_queries
    return jnp.arange(num_queries) * stride


def contrastive_loss(
    q_reps: jnp.ndarray, p_reps: jnp.ndarray, targets: jnp.ndarray = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-batch softmax CE over the q·pᵀ score matrix. Returns (loss, scores)."""
    scores = jnp.dot(
        q_reps.astype(jnp.float32),
        p_reps.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    if targets is None:
        targets = stride_targets(q_reps.shape[0], p_reps.shape[0])
    loss = optax.softmax_cross_entropy_with_integer_labels(scores, targets).mean()
    return loss, scores


# ---------------------------------------------------------------------------
# Reranker pairwise losses (reference losses.py:48-80)
# ---------------------------------------------------------------------------


def margin_ranking_loss(pos_scores, neg_scores, margin: float = 1.0):
    return jnp.mean(jax.nn.relu(margin - pos_scores + neg_scores))


def soft_margin_ranking_loss(pos_scores, neg_scores, margin: float = 1.0):
    return jnp.mean(jax.nn.softplus(margin - pos_scores + neg_scores))


def binary_cross_entropy_loss(pos_scores, neg_scores, margin: float = 1.0):
    pos = optax.sigmoid_binary_cross_entropy(pos_scores, jnp.ones_like(pos_scores)).mean()
    neg = optax.sigmoid_binary_cross_entropy(neg_scores, jnp.zeros_like(neg_scores)).mean()
    return pos + neg


def cross_entropy_loss(pos_scores, neg_scores, margin: float = 1.0):
    """CE over 2-way [neg_logit, pos_logit] scores (T5 token-scoring reranker)."""
    pos_t = jnp.ones(pos_scores.shape[0], dtype=jnp.int32)
    neg_t = jnp.zeros(neg_scores.shape[0], dtype=jnp.int32)
    return (
        optax.softmax_cross_entropy_with_integer_labels(pos_scores, pos_t).mean()
        + optax.softmax_cross_entropy_with_integer_labels(neg_scores, neg_t).mean()
    )


rr_loss_functions = {
    "mr": margin_ranking_loss,
    "smr": soft_margin_ranking_loss,
    "bce": binary_cross_entropy_loss,
    "ce": cross_entropy_loss,
}
