"""Streaming blocked top-k and score-position counting.

The reference materializes the full users x items score matrix on one device
(src/recommender/models/BPRMF.py:85) and walks it per user in Python
(src/recommender/Evaluator.py:181-187).  At the BASELINE.json scaled config
(1M users x 500k items) that matrix is ~2TB — the eval engine must stream.

These ops consume FACTORED scores (score = u . v + b): a lax.scan over item
blocks keeps a running top-k and running >=-count per user, so peak memory is
[users_block x item_block] regardless of catalog size.  The same ops run
per-shard for the distributed evaluator (items sharded over `model`, local
candidates merged by all_gather + final top-k).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _merge_topk(run_vals, run_idx, blk_vals, blk_idx, k):
    """Merge running [U, k] with block [U, kb] candidates -> new running."""
    vals = jnp.concatenate([run_vals, blk_vals], axis=1)
    idx = jnp.concatenate([run_idx, blk_idx], axis=1)
    new_vals, pos = jax.lax.top_k(vals, k)
    new_idx = jnp.take_along_axis(idx, pos, axis=1)
    return new_vals, new_idx


OUT_OF_RANGE_ID = 2**30  # filler id no catalog reaches


def streaming_topk_and_counts(
    user_vecs: jax.Array,  # [Bu, D]
    item_vecs: jax.Array,  # [I, D]
    item_bias: Optional[jax.Array],  # [I] or None
    k: int,
    ref_scores: Optional[jax.Array] = None,  # [Bu, T] reference scores
    banned_ids: Optional[jax.Array] = None,  # [Bu, Pb] ids EXCLUDED from counts
    item_block: int = 4096,
    item_offset: int = 0,
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """One pass over the catalog in blocks.

    Returns (top_vals [Bu,k], top_idx [Bu,k] global ids, ge_counts [Bu,T])
    where ge_counts[t] = |{i not in banned_ids[u] : s_ui >= ref_scores[u,t]}|
    over this shard's items — i.e. the AUC position count over the
    candidate-negative set directly.

    Exclusions happen BY ID inside the scan, never by comparing externally
    recomputed scores: the block matmul and a pointwise dot can disagree in
    the last ulp, which would shift position counts at exact-tie boundaries.
    Pad banned_ids with a negative value (never matches a catalog id).

    Top-k filler entries (users with fewer than k finite candidates) carry
    OUT_OF_RANGE_ID so they can never collide with a real item id downstream.
    """
    Bu, D = user_vecs.shape
    I = item_vecs.shape[0]
    blk = min(item_block, I)
    n_blocks = -(-I // blk)
    pad = n_blocks * blk - I

    iv = jnp.pad(item_vecs, ((0, pad), (0, 0)))
    ib = (
        jnp.pad(item_bias, (0, pad)) if item_bias is not None
        else jnp.zeros((n_blocks * blk,), user_vecs.dtype)
    )
    iv_blocks = iv.reshape(n_blocks, blk, D)
    ib_blocks = ib.reshape(n_blocks, blk)
    # padded items masked to -inf so they never enter top-k or counts
    valid = (jnp.arange(n_blocks * blk) < I).reshape(n_blocks, blk)

    kb = min(k, blk)
    init_vals = jnp.full((Bu, k), -jnp.inf, user_vecs.dtype)
    init_idx = jnp.full((Bu, k), OUT_OF_RANGE_ID, jnp.int32)
    has_ref = ref_scores is not None
    init_counts = jnp.zeros(ref_scores.shape, jnp.int32) if has_ref else None

    def body(carry, xs):
        run_vals, run_idx, counts = carry
        iv_b, ib_b, valid_b, base = xs
        scores = user_vecs @ iv_b.T + ib_b[None, :]  # [Bu, blk] (MXU)
        scores = jnp.where(valid_b[None, :], scores, -jnp.inf)
        # approx_max_k with recall_target=1.0 is EXACT (values and indices
        # match lax.top_k, pinned in tests) but lowers to TPU PartialReduce
        # instead of a full sort: measured 4364ms -> 41ms for top-84 of a
        # [4096, 32768] block — the streaming evaluator's former bottleneck
        blk_vals, blk_pos = jax.lax.approx_max_k(scores, kb, recall_target=1.0)
        blk_idx = blk_pos.astype(jnp.int32) + (base + item_offset)
        # filler lanes (-inf from block padding) get the sentinel id
        blk_idx = jnp.where(
            jnp.isneginf(blk_vals), OUT_OF_RANGE_ID, blk_idx
        )
        run_vals, run_idx = _merge_topk(run_vals, run_idx, blk_vals, blk_idx, k)
        if has_ref:
            # global item ids of this block (offset applies under sharding)
            gid = (
                jnp.arange(blk, dtype=jnp.int32)[None, :] + base + item_offset
            )  # [1, blk]
            if banned_ids is not None:
                allowed = jnp.logical_not(
                    (gid[:, :, None] == banned_ids[:, None, :]).any(axis=2)
                )  # [Bu, blk]
            else:  # no exclusions: every catalog item counts
                allowed = jnp.ones_like(scores, dtype=bool)
            ge = jnp.logical_and(
                jnp.logical_and(
                    scores[:, :, None] >= ref_scores[:, None, :],
                    allowed[:, :, None],
                ),
                valid_b[None, :, None],
            ).sum(axis=1, dtype=jnp.int32)
            counts = counts + ge
        return (run_vals, run_idx, counts), None

    bases = jnp.arange(n_blocks, dtype=jnp.int32) * blk
    (top_vals, top_idx, counts), _ = jax.lax.scan(
        body, (init_vals, init_idx, init_counts),
        (iv_blocks, ib_blocks, valid, bases),
    )
    return top_vals, top_idx, counts


def streaming_counts(
    user_vecs: jax.Array,  # [Bu, D]
    item_vecs: jax.Array,  # [I, D]
    item_bias: Optional[jax.Array],  # [I] or None
    ref_scores: jax.Array,  # [Bu, T]
    banned_ids: Optional[jax.Array],  # [Bu, Pb] ids EXCLUDED from counts
    item_block: int = 4096,
    item_offset: int = 0,
) -> jax.Array:
    """Counts-only streaming pass: ge_counts [Bu, T] as in
    streaming_topk_and_counts, WITHOUT the top-k accumulation.

    The per-epoch metric path needs no top-k at all: under the reference's
    candidate protocol, "eval item in the top-k" is exactly "fewer than k
    candidates ranked above it", and the rank is derivable from these
    counts (plus the tiny eval-vs-eval comparisons) — see
    eval/factored.py.  Dropping the top-k removes the kernel's dominant
    cost (the PartialReduce custom call was ~87% of the block scan)."""
    Bu, D = user_vecs.shape
    I = item_vecs.shape[0]
    blk = min(item_block, I)
    n_blocks = -(-I // blk)
    pad = n_blocks * blk - I

    iv = jnp.pad(item_vecs, ((0, pad), (0, 0)))
    ib = (
        jnp.pad(item_bias, (0, pad)) if item_bias is not None
        else jnp.zeros((n_blocks * blk,), user_vecs.dtype)
    )
    iv_blocks = iv.reshape(n_blocks, blk, D)
    ib_blocks = ib.reshape(n_blocks, blk)
    valid = (jnp.arange(n_blocks * blk) < I).reshape(n_blocks, blk)

    def body(counts, xs):
        iv_b, ib_b, valid_b, base = xs
        scores = user_vecs @ iv_b.T + ib_b[None, :]  # [Bu, blk] (MXU)
        gid = (
            jnp.arange(blk, dtype=jnp.int32)[None, :] + base + item_offset
        )  # [1, blk]
        if banned_ids is not None:
            allowed = jnp.logical_not(
                (gid[:, :, None] == banned_ids[:, None, :]).any(axis=2)
            )  # [Bu, blk]
        else:
            allowed = jnp.ones_like(scores, dtype=bool)
        ge = jnp.logical_and(
            jnp.logical_and(
                scores[:, :, None] >= ref_scores[:, None, :],
                allowed[:, :, None],
            ),
            valid_b[None, :, None],
        ).sum(axis=1, dtype=jnp.int32)
        return counts + ge, None

    bases = jnp.arange(n_blocks, dtype=jnp.int32) * blk
    counts, _ = jax.lax.scan(
        body, jnp.zeros(ref_scores.shape, jnp.int32),
        (iv_blocks, ib_blocks, valid, bases),
    )
    return counts


def filter_items_topk(
    top_vals: jax.Array,  # [Bu, k_big] sorted desc
    top_idx: jax.Array,  # [Bu, k_big]
    banned: jax.Array,  # [Bu, P] padded banned ids (e.g. train items)
    banned_counts: jax.Array,  # [Bu]
    k: int,
):
    """Drop banned ids from an oversized candidate list and keep the first k.

    The masking trick replacing the dense [U, I] -inf mask
    (Evaluator.py:232-234): retrieve k + max_banned candidates, then filter.
    """
    P = banned.shape[1]
    valid_b = jnp.arange(P)[None, :] < banned_counts[:, None]
    is_banned = jnp.logical_and(
        top_idx[:, :, None] == banned[:, None, :], valid_b[:, None, :]
    ).any(axis=2)
    vals = jnp.where(is_banned, -jnp.inf, top_vals)
    new_vals, pos = jax.lax.top_k(vals, k)
    new_idx = jnp.take_along_axis(top_idx, pos, axis=1)
    return new_vals, new_idx
