"""Gradient-x-input explanation utilities.

TPU-native replacement for the reference explanation path
(src/recommender/models/GradFashion.py:269-302 +
src/recommender/Evaluator.py:261-275): attributions for all of a user's
positive items in one jitted vmapped program, plus the review-join analysis
of src/get_explanations.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def _pow2(n: int) -> int:
    return 1 << max(0, n - 1).bit_length() if n > 1 else 1


def batched_attributions(
    batch_fn: Callable,
    params,
    frozen,
    data,
    user_block: int = 512,
) -> Dict[int, np.ndarray]:
    """Grad-x-input attributions for every (user, positive-item) pair,
    computed in BUCKETED fixed-shape blocks — a few compiled programs total
    instead of one dispatch (and possibly one compile) per user.

    The reference fans a GradientTape per (u, i) over a thread pool
    (src/recommender/models/GradFashion.py:294-302); the previous engine here
    still dispatched per user with a different positive-list length each time
    (recompile per distinct count).  This one pads each user's positive list
    to the next power-of-two width, groups users by that width, and runs
    `batch_fn(params, frozen, users [B], items [B, W]) -> [B, W, 2]` on
    power-of-two-sized user blocks: compiled-program count is bounded by
    log2(max_pos) x log2(user_block) regardless of catalog scale.

    Pad slots repeat the row's first item; their attributions are computed
    and discarded.  Grads are per-item independent, so real slots match the
    per-user path to the last ulp (the outer vmap batches the matmuls, so
    exact bit-equality is not guaranteed — pinned at rtol=1e-5 in
    tests/test_grad_fashion.py).

    Returns {user: [n_pos, 2] float32} for users with >= 1 positive.
    """
    per_user: Dict[int, Sequence[int]] = {}
    buckets: Dict[int, list] = {}
    for u in range(data.num_users):
        pos = (
            data.training_list[u] + data.validation_list[u] + data.test_list[u]
        )
        if not pos:
            continue
        per_user[u] = pos
        buckets.setdefault(_pow2(len(pos)), []).append(u)

    # ONE vectorized ragged->padded pass for every user (pad slots repeat
    # the row's first item): the former per-row python assembly loop was
    # the engine's measured host wall (~2-4s over 200k users, round-5
    # xplane decomposition) — five numpy passes replace it
    import itertools

    uids = np.fromiter(per_user.keys(), np.int64, len(per_user))
    lens = np.fromiter((len(v) for v in per_user.values()), np.int64,
                       len(per_user))
    total = int(lens.sum())
    flat = np.fromiter(
        itertools.chain.from_iterable(per_user.values()), np.int32, total
    )
    offs = np.cumsum(lens) - lens
    w_max = int(lens.max())
    rr = np.repeat(np.arange(len(uids)), lens)
    cc = np.arange(total) - np.repeat(offs, lens)
    dense_ids = np.zeros((len(uids), w_max), np.int32)
    dense_ids[rr, cc] = flat
    valid = np.arange(w_max)[None, :] < lens[:, None]
    dense_ids = np.where(valid, dense_ids, dense_ids[:, :1])
    row_of = {int(u): i for i, u in enumerate(uids)}

    fn = jax.jit(batch_fn)
    out: Dict[int, np.ndarray] = {}
    # two passes: DISPATCH every block first, fetch after.  The previous
    # per-block np.asarray forced a device sync per block — at ~98 blocks
    # that serialized ~76ms of host/dispatch/RTT work against a 0.87ms
    # device program (round-5 xplane); deferring the fetches overlaps the
    # host assembly and transfers with device compute and pays the
    # readback pipeline once.  Device residency is tiny ([B, W, 2] f32
    # per block, ~50MB total at catalog scale).
    pending = []
    for width, users in sorted(buckets.items()):
        urows = np.fromiter((row_of[u] for u in users), np.int64, len(users))
        for s in range(0, len(users), user_block):
            chunk = users[s : s + user_block]
            B = _pow2(min(len(chunk), user_block))
            idx = np.minimum(np.arange(B), len(chunk) - 1)
            u_arr = np.asarray(chunk, np.int32)[idx]  # tail pad: last user
            i_arr = dense_ids[urows[s : s + user_block][idx], :width]
            pending.append(
                (chunk,
                 fn(params, frozen, jnp.asarray(u_arr), jnp.asarray(i_arr)))
            )
    for chunk, g_dev in pending:
        g = np.asarray(g_dev)
        for r, u in enumerate(chunk):
            out[u] = g[r, : len(per_user[u])].astype(np.float32)
    return out


def write_grads_tsv(
    path: str,
    data,
    params,
    frozen,
    grads_fn: Optional[Callable] = None,
    batch_grads_fn: Optional[Callable] = None,
    user_block: int = 512,
) -> None:
    """Gradient-attribution TSV (reference Evaluator.py:261-275 format):
    `user\\titem\\tcolor_attr\\tedges_attr` for every positive (train +
    validation + test) item of each user, in user order.

    With ``batch_grads_fn`` (batch_fn contract of batched_attributions) the
    bucketed batched engine runs; otherwise falls back to the per-user
    ``grads_fn(params, frozen, user, items) -> [len(items), 2]`` loop."""
    if batch_grads_fn is not None:
        att = batched_attributions(
            batch_grads_fn, params, frozen, data, user_block=user_block
        )
        with open(path, "w") as out:
            for u in sorted(att):
                pos = (
                    data.training_list[u]
                    + data.validation_list[u]
                    + data.test_list[u]
                )
                g = att[u]
                for i, item in enumerate(pos):
                    out.write(f"{u}\t{item}\t{g[i, 0]}\t{g[i, 1]}\n")
        return
    if grads_fn is None:
        raise ValueError("one of grads_fn / batch_grads_fn is required")
    with open(path, "w") as out:
        for u in range(data.num_users):
            pos_items = (
                data.training_list[u]
                + data.validation_list[u]
                + data.test_list[u]
            )
            if not pos_items:
                continue
            g = np.asarray(
                grads_fn(params, frozen, u, jnp.asarray(pos_items, jnp.int32))
            )
            for i, item in enumerate(pos_items):
                out.write(f"{u}\t{item}\t{g[i, 0]}\t{g[i, 1]}\n")


def explanation_table(
    model,
    params,
    frozen,
    data,
    jit: bool = True,
    batched: bool = True,
) -> pd.DataFrame:
    """DataFrame [USER_ID, ITEM_ID, COLOR, EDGES] of grad-x-input attributions
    for every (user, positive-item) pair — the content of
    store_recommendation_grads (Evaluator.py:261-275).

    Uses the bucketed batched engine when the model provides
    `feature_attributions_block` (a few compiled programs total);
    `batched=False` forces the per-user loop (the engines' equivalence is
    pinned in tests)."""
    rows = []
    if batched and hasattr(model, "feature_attributions_block"):
        att = batched_attributions(
            model.feature_attributions_block, params, frozen, data
        )
        for u in sorted(att):
            pos_items = (
                data.training_list[u] + data.validation_list[u]
                + data.test_list[u]
            )
            for item, (c, e) in zip(pos_items, att[u]):
                rows.append((u, item, float(c), float(e)))
        return pd.DataFrame(
            rows, columns=["USER_ID", "ITEM_ID", "COLOR", "EDGES"]
        )
    fn = model.feature_attributions
    if jit:
        fn = jax.jit(fn, static_argnums=())
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
