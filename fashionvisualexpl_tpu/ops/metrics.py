"""Vectorized full-catalog ranking metrics.

Exact semantic parity with the reference's per-user host loop
(src/recommender/Evaluator.py:82-128), but computed for ALL users at once on
device.  The reference protocol, reproduced faithfully:

- Candidate list per user = (all items − train items) ∪ eval items, with the
  split's eval items logically at the tail (Evaluator.py:40-53).
- AUC: ``position`` = Σ over eval items t of |{negatives with score >= s_t}|
  where negatives = candidates minus eval items; auc = 1 − position /
  (num_neg * num_pos)  (Evaluator.py:92-101).
- HR / Precision / Recall: top-K of the candidate scores; r = indicator of
  eval-item membership in the top-K; hr = 1 if any hit, prec = hits/K,
  rec = hits/num_pos  (Evaluator.py:103-126).
- NDCG (the reference's nonstandard formula, Evaluator.py:120):
  log(2)/log(position + 2) if position < K else 0 — note it uses the *AUC*
  position count, not a rank.
- Users with an empty eval list are excluded from the mean
  (Evaluator.py:189-193 via the filter at :84-87).

Shapes are static: eval items come padded ([U, T], pad = 0 with a validity
count vector), masks are dense [U, I] bools.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


class PerUserMetrics(NamedTuple):
    hr: jax.Array  # [U]
    prec: jax.Array  # [U]
    rec: jax.Array  # [U]
    auc: jax.Array  # [U]
    ndcg: jax.Array  # [U]
    valid: jax.Array  # [U] bool — user has a non-empty eval list


class MeanMetrics(NamedTuple):
    hr: jax.Array
    prec: jax.Array
    rec: jax.Array
    auc: jax.Array
    ndcg: jax.Array
    num_users: jax.Array


def eval_users(
    scores: jax.Array,  # [U, I] float
    train_mask: jax.Array,  # [U, I] bool
    eval_items: jax.Array,  # [U, T] int32, padded (pad value arbitrary in-range)
    eval_counts: jax.Array,  # [U] int32 — number of valid eval items per user
    k: int,
) -> PerUserMetrics:
    U, I = scores.shape
    T = eval_items.shape[1]
    t_valid = (
        jnp.arange(T, dtype=jnp.int32)[None, :] < eval_counts[:, None]
    )  # [U, T]

    eval_mask = jnp.zeros((U, I), dtype=bool)
    eval_mask = eval_mask.at[
        jnp.arange(U)[:, None], eval_items
    ].max(t_valid)  # scatter-or of valid eval items

    neg_mask = jnp.logical_and(~train_mask, ~eval_mask)  # [U, I]
    cand_mask = jnp.logical_or(~train_mask, eval_mask)  # [U, I]

    pos_scores = jnp.take_along_axis(scores, eval_items, axis=1)  # [U, T]

    # position_t[u, t] = |{i in neg : scores[u,i] >= pos_scores[u,t]}|
    # Loop over the (small, static) T axis to avoid a [U, I, T] intermediate.
    position = jnp.zeros((U,), jnp.int32)
    position_t = []
    for t in range(T):
        ge = jnp.logical_and(
            neg_mask, scores >= pos_scores[:, t : t + 1]
        ).sum(axis=1, dtype=jnp.int32)
        position_t.append(ge)
        position = position + jnp.where(t_valid[:, t], ge, 0)
    position_t = jnp.stack(position_t, axis=1)  # [U, T]

    num_neg = neg_mask.sum(axis=1, dtype=jnp.int32)
    num_pos = eval_counts
    denom = jnp.maximum(num_neg * num_pos, 1).astype(jnp.float32)
    auc = 1.0 - position.astype(jnp.float32) / denom
    del cand_mask  # hits are count-based; no top-k over the item axis

    # count-based hits: under the candidate protocol (negatives in id
    # order, eval items appended at the tail, heapq.nlargest stable
    # ordering — Evaluator.py:36-56,103-117) eval item t is in the top-k
    # iff rank_t < k, rank_t = |negatives >= s_t| + |earlier eval >= s_t|
    # + |later eval > s_t|.  Avoids the [U, I] top-k (a full-sort lowering
    # on TPU) entirely.
    later_gt = jnp.logical_and(
        pos_scores[:, None, :] > pos_scores[:, :, None],
        jnp.arange(T)[None, None, :] > jnp.arange(T)[None, :, None],
    )
    earlier_ge = jnp.logical_and(
        pos_scores[:, None, :] >= pos_scores[:, :, None],
        jnp.arange(T)[None, None, :] < jnp.arange(T)[None, :, None],
    )
    eval_above = jnp.logical_and(
        jnp.logical_or(later_gt, earlier_ge), t_valid[:, None, :]
    ).sum(axis=2, dtype=jnp.int32)  # [U, T]
    hit_t = jnp.logical_and(t_valid, position_t + eval_above < k)
    hits = hit_t.sum(axis=1).astype(jnp.float32)

    hr = (hits > 0).astype(jnp.float32)
    prec = hits / float(k)
    rec = hits / jnp.maximum(num_pos, 1).astype(jnp.float32)
    ndcg = jnp.where(
        position < k,
        jnp.log(2.0) / jnp.log(position.astype(jnp.float32) + 2.0),
        0.0,
    )
    valid = num_pos > 0
    return PerUserMetrics(hr, prec, rec, auc, ndcg, valid)


def mean_metrics(m: PerUserMetrics) -> MeanMetrics:
    n = jnp.maximum(m.valid.sum(), 1).astype(jnp.float32)

    def avg(x):
        return jnp.where(m.valid, x, 0.0).sum() / n

    return MeanMetrics(
        hr=avg(m.hr),
        prec=avg(m.prec),
        rec=avg(m.rec),
        auc=avg(m.auc),
        ndcg=avg(m.ndcg),
        num_users=m.valid.sum(),
    )


def topk_recommendations(
    scores: jax.Array,  # [U, I]
    train_mask: jax.Array,  # [U, I] bool
    k: int,
):
    """Top-k over all items with train items masked to -inf — the protocol of
    Evaluator.store_recommendation (Evaluator.py:225-239).  Returns
    (top_idx [U,k], top_scores [U,k]) sorted descending."""
    masked = jnp.where(train_mask, NEG_INF, scores)
    top_scores, top_idx = jax.lax.approx_max_k(masked, k, recall_target=1.0)
    return top_idx, top_scores
