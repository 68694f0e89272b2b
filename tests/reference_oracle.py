"""Pure-numpy oracles implementing the reference's exact semantics, used as
ground truth by the test suite (SURVEY.md §4: unit tests pin scoring/loss/
metric functions against literal re-derivations of the reference formulas).

Oracle semantics sources:
- per-user metrics: reference src/recommender/Evaluator.py:82-128
- BPR loss + reg quirks: reference src/recommender/models/BPRMF.py:104-112
- VBPR scoring/reg: reference src/recommender/models/VBPR.py:82-84,121-127
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def eval_by_user_oracle(
    scores_row: np.ndarray,  # [I] this user's predicted scores
    train_items: Sequence[int],
    eval_items: Sequence[int],
    k: int,
):
    """Reference _eval_by_user: returns (hr, prec, rec, auc, ndcg) or None if
    the user has no eval items."""
    num_items = scores_row.shape[0]
    if len(eval_items) == 0:
        return None

    # candidate list: (all - train) with eval items appended at the tail
    cand = sorted(set(range(num_items)) - set(train_items) - set(eval_items))
    item_input = cand + list(eval_items)

    predictions = scores_row[np.asarray(item_input)]
    neg_predict = predictions[: -len(eval_items)]
    pos_predict = predictions[-len(eval_items):]

    position = 0
    for t in range(len(eval_items)):
        position += int((neg_predict >= pos_predict[t]).sum())
    auc = 1 - position / (len(neg_predict) * len(pos_predict))

    # top-k over candidate scores (ties: highest score wins; score ties are
    # measure-zero for float random scores used in tests)
    item_arr = np.asarray(item_input)
    order = np.argsort(-predictions, kind="stable")
    top_k_items = item_arr[order[:k]]
    eval_set = set(eval_items)
    r = [1 if i in eval_set else 0 for i in top_k_items]

    hr = 1.0 if sum(r) > 0 else 0.0
    ndcg = np.log(2) / np.log(position + 2) if position < k else 0.0
    prec = sum(r) / len(r)
    rec = sum(r) / len(pos_predict)
    return hr, prec, rec, auc, ndcg


def mean_eval_oracle(
    scores: np.ndarray,  # [U, I]
    training_list: List[List[int]],
    eval_list: List[List[int]],
    k: int,
):
    res = []
    for u in range(scores.shape[0]):
        r = eval_by_user_oracle(scores[u], training_list[u], eval_list[u], k)
        if r is not None:
            res.append(r)
    return np.asarray(res).mean(axis=0)  # hr, prec, rec, auc, ndcg


def softplus(x):
    return np.logaddexp(0.0, x)


def l2(x):
    return 0.5 * np.sum(np.square(x))


def bprmf_loss_oracle(Bi, Gu, Gi, users, pos, neg, reg):
    """Reference BPRMF train-step loss (BPRMF.py:95-112)."""
    gamma_u = Gu[users]
    beta_pos, gamma_pos = Bi[pos], Gi[pos]
    beta_neg, gamma_neg = Bi[neg], Gi[neg]
    x_pos = beta_pos + np.sum(gamma_u * gamma_pos, axis=1)
    x_neg = beta_neg + np.sum(gamma_u * gamma_neg, axis=1)
    diff = np.clip(x_pos - x_neg, -80.0, 1e8)
    loss = np.sum(softplus(-diff))
    reg_loss = (
        reg * (l2(gamma_u) + l2(gamma_pos) + l2(gamma_neg)) * 2
        + reg * l2(beta_pos) * 2
        + reg * l2(beta_neg) * 2 / 10
    )
    return loss + reg_loss


def vbpr_predict_all_oracle(Bi, Gu, Gi, Tu, F, E, Bp):
    """Reference VBPR predict_all (VBPR.py:88-97)."""
    return (
        Bi[None, :]
        + Gu @ Gi.T
        + Tu @ (F @ E).T
        + (F @ Bp).reshape(-1)[None, :]
    )
