"""Gradient-x-input explanation utilities.

TPU-native replacement for the reference explanation path
(src/recommender/models/GradFashion.py:269-302 +
src/recommender/Evaluator.py:261-275): attributions for all of a user's
positive items in one jitted vmapped program, plus the review-join analysis
of src/get_explanations.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def explanation_table(
    model,
    params,
    frozen,
    data,
    jit: bool = True,
) -> pd.DataFrame:
    """DataFrame [USER_ID, ITEM_ID, COLOR, EDGES] of grad-x-input attributions
    for every (user, positive-item) pair — the content of
    store_recommendation_grads (Evaluator.py:261-275)."""
    fn = model.feature_attributions
    if jit:
        fn = jax.jit(fn, static_argnums=())
    rows = []
    for u in range(data.num_users):
        pos_items = (
            data.training_list[u] + data.validation_list[u] + data.test_list[u]
        )
        if not pos_items:
            continue
        g = np.asarray(fn(params, frozen, u, jnp.asarray(pos_items, jnp.int32)))
        for item, (c, e) in zip(pos_items, g):
            rows.append((u, item, float(c), float(e)))
    return pd.DataFrame(rows, columns=["USER_ID", "ITEM_ID", "COLOR", "EDGES"])


def join_reviews(
    grads: pd.DataFrame,
    reviews: pd.DataFrame,
    top_n: int = 50,
):
    """The get_explanations.py analysis (get_explanations.py:17-37): join
    attributions with review text, rank by COLOR-EDGES delta, return the
    top-N color-driven and edge-driven recommendation tables."""
    merged = pd.merge(grads, reviews, on=["USER_ID", "ITEM_ID"], how="inner")
    for col in ("USER", "ASIN", "TIME", "CATEGORY"):
        if col in merged.columns:
            merged = merged.drop(columns=[col])
    merged["DIFF"] = merged["COLOR"] - merged["EDGES"]
    color_driven = merged.sort_values("DIFF", ascending=False).head(top_n)
    edge_driven = merged.sort_values("DIFF", ascending=True).head(top_n)
    return color_driven, edge_driven
