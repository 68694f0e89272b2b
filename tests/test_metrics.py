"""Metric parity: device-vectorized metrics vs the reference-semantics oracle."""

import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import (
    multi_hot,
    pad_lists,
    synthetic_interactions,
)
from fashionvisualexpl_tpu.ops.metrics import eval_users, mean_metrics
from tests.reference_oracle import mean_eval_oracle


def _run_both(scores, training_list, eval_list, k):
    num_items = scores.shape[1]
    train_mask = jnp.asarray(multi_hot(training_list, num_items))
    items, counts = pad_lists(eval_list, pad_value=0)
    m = eval_users(
        jnp.asarray(scores), train_mask, jnp.asarray(items),
        jnp.asarray(counts), k,
    )
    ours = mean_metrics(m)
    oracle = mean_eval_oracle(scores, training_list, eval_list, k)
    return ours, oracle


def test_metrics_match_oracle_single_eval_item():
    rng = np.random.default_rng(0)
    U, I, k = 25, 60, 10
    data = synthetic_interactions(U, I, interactions_per_user=8, seed=3)
    scores = rng.normal(size=(U, I)).astype(np.float32)
    ours, oracle = _run_both(scores, data.training_list, data.test_list, k)
    got = np.array([ours.hr, ours.prec, ours.rec, ours.auc, ours.ndcg])
    np.testing.assert_allclose(got, oracle, rtol=1e-6, atol=1e-6)


def test_metrics_match_oracle_multi_eval_items():
    rng = np.random.default_rng(7)
    U, I, k = 12, 40, 5
    training_list, eval_list = [], []
    for u in range(U):
        items = rng.choice(I, size=10, replace=False)
        n_eval = rng.integers(0, 4)  # includes users with empty eval lists
        eval_list.append(items[:n_eval].tolist())
        training_list.append(items[n_eval:].tolist())
    scores = rng.normal(size=(U, I)).astype(np.float32)
    ours, oracle = _run_both(scores, training_list, eval_list, k)
    got = np.array([ours.hr, ours.prec, ours.rec, ours.auc, ours.ndcg])
    np.testing.assert_allclose(got, oracle, rtol=1e-6, atol=1e-6)
    # users with empty eval lists are excluded, like Evaluator.py:189-193
    assert int(ours.num_users) == sum(1 for e in eval_list if e)


def test_perfect_model_metrics():
    """A model that scores the test item highest must get HR=NDCG=AUC=1."""
    U, I, k = 6, 30, 5
    data = synthetic_interactions(U, I, interactions_per_user=5, seed=2)
    scores = np.zeros((U, I), dtype=np.float32)
    for u in range(U):
        scores[u, data.test_list[u][0]] = 10.0
    ours, oracle = _run_both(scores, data.training_list, data.test_list, k)
    assert float(ours.hr) == 1.0
    assert float(ours.auc) == 1.0
    np.testing.assert_allclose(float(ours.ndcg), 1.0)
    np.testing.assert_allclose(
        np.array([ours.hr, ours.prec, ours.rec, ours.auc, ours.ndcg]),
        oracle, rtol=1e-6,
    )


def test_count_based_hits_match_oracle_under_ties():
    """hits are now rank-count-based (no top-k); the ranking must match the
    oracle's stable candidate-list ordering EXACTLY, including score ties
    (quantized scores force many)."""
    import numpy as np

    from fashionvisualexpl_tpu.data.interactions import multi_hot, pad_lists
    from fashionvisualexpl_tpu.ops.metrics import eval_users
    from tests.reference_oracle import eval_by_user_oracle

    rng = np.random.default_rng(17)
    U, I, k = 12, 30, 5
    scores = rng.integers(0, 4, size=(U, I)).astype(np.float32)  # heavy ties
    training_list, eval_list = [], []
    for u in range(U):
        perm = rng.permutation(I)
        training_list.append(sorted(perm[:6].tolist()))
        n_eval = int(rng.integers(1, 4))
        eval_list.append(sorted(perm[6:6 + n_eval].tolist()))

    train_mask = jnp.asarray(multi_hot(training_list, I))
    items, counts = pad_lists(eval_list, pad_value=0)
    got = eval_users(jnp.asarray(scores), train_mask,
                     jnp.asarray(items), jnp.asarray(counts), k)
    for u in range(U):
        want = eval_by_user_oracle(scores[u], training_list[u], eval_list[u], k)
        got_u = (float(got.hr[u]), float(got.prec[u]), float(got.rec[u]),
                 float(got.auc[u]), float(got.ndcg[u]))
        np.testing.assert_allclose(got_u, np.asarray(want, np.float64),
                                   rtol=1e-5, err_msg=f"user {u}")
