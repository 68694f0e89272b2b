"""Property fuzz: vectorized metrics vs the reference oracle across many
random dataset shapes, eval-list sizes, and k values."""

import jax.numpy as jnp
import numpy as np
import pytest

from fashionvisualexpl_tpu.data.interactions import multi_hot, pad_lists
from fashionvisualexpl_tpu.ops.metrics import eval_users, mean_metrics
from tests.reference_oracle import mean_eval_oracle


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_metrics_vs_oracle(trial):
    rng = np.random.default_rng(trial)
    U = int(rng.integers(3, 30))
    I = int(rng.integers(15, 80))
    k = int(rng.integers(1, min(12, I - 5)))
    training_list, eval_list = [], []
    for u in range(U):
        n_items = int(rng.integers(1, min(12, I - 2)))
        items = rng.choice(I, size=n_items, replace=False)
        n_eval = int(rng.integers(0, min(4, n_items)))
        eval_list.append(items[:n_eval].tolist())
        training_list.append(items[n_eval:].tolist())
    if not any(eval_list):
        eval_list[0] = [int(rng.integers(0, I))]
        training_list[0] = [
            i for i in training_list[0] if i != eval_list[0][0]
        ]
    scores = rng.normal(size=(U, I)).astype(np.float32)

    train_mask = jnp.asarray(multi_hot(training_list, I))
    items, counts = pad_lists(eval_list, pad_value=0)
    ours = mean_metrics(eval_users(
        jnp.asarray(scores), train_mask, jnp.asarray(items),
        jnp.asarray(counts), k,
    ))
    oracle = mean_eval_oracle(scores, training_list, eval_list, k)
    got = np.array([ours.hr, ours.prec, ours.rec, ours.auc, ours.ndcg])
    np.testing.assert_allclose(got, oracle, rtol=1e-5, atol=1e-6,
                               err_msg=f"trial {trial} U={U} I={I} k={k}")
