"""Exact on-device negative sampling.

Replaces the reference's host-Python rejection loop — which materializes BPR
triples for ALL epochs up front (reference src/dataset/dataset.py:83-114, with
the `while j in uis` rejection at :100-103) — with a closed-form, loop-free
device sampler:

For user u with sorted unique positives p_0 < p_1 < ... < p_{c-1}, the r-th
smallest NON-positive item (r uniform in [0, num_items - c)) is

    j = r + k,   k = |{ t : p_t - t <= r }|

computed as one fused O(P) comparison count over the fixed-width padded rows
(out-of-range sentinels from data/interactions.py:pad_sorted_positives never
count) — no rejection, no data-dependent control flow, exactly uniform over
the complement (the distribution the reference's rejection loop converges
to).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _negatives_from_rows(key, rows, counts, num_items):
    """Closed-form complement sampling given pre-gathered positive rows."""
    # r ~ Uniform[0, num_items - c)
    u01 = jax.random.uniform(key, (rows.shape[0],))
    r = jnp.floor(u01 * (num_items - counts)).astype(jnp.int32)
    r = jnp.minimum(r, num_items - counts - 1)  # guard the u01==1.0 edge
    shifted = rows - jnp.arange(rows.shape[1], dtype=jnp.int32)[None, :]  # [B, P]
    # k = |{t : shifted_t <= r}|.  A vmapped binary search lowers to a
    # log(P)-step dynamic-gather loop on TPU; for the small padded widths
    # here the O(P) comparison count is one fused elementwise+reduce pass
    # (measured ~9ms -> <1ms per 180k-triple epoch at P=18)
    k = jnp.sum(shifted <= r[:, None], axis=1, dtype=jnp.int32)
    return r + k


def sample_negatives(
    key: jax.Array,
    users: jax.Array,  # [B] int32
    padded_pos: jax.Array,  # [U, P] int32, strictly increasing rows
    pos_counts: jax.Array,  # [U] int32
    num_items: int,
) -> jax.Array:
    """Sample one negative item per batch row, uniform over non-positives."""
    rows = jnp.take(padded_pos, users, axis=0)  # [B, P]
    counts = jnp.take(pos_counts, users)  # [B]
    return _negatives_from_rows(key, rows, counts, num_items)


def sample_triplets(
    key: jax.Array,
    train_pairs: jax.Array,  # [N, 2] int32, USER-MAJOR contiguous
    padded_pos: jax.Array,
    pos_counts: jax.Array,
    num_items: int,
    num_steps: int,
    batch_size: int,
    with_replacement=False,
):
    """Build one epoch of shuffled BPR triplet batches, fully on device.

    Returns (users, pos, neg), each [num_steps, batch_size] int32.

    `with_replacement` selects the epoch-ordering scheme:

    - False / "user_perm" (default): the REFERENCE's exact epoch semantics
      (dataset.py:94-99): shuffle the USER order, then visit each user's
      positives in their stored order, fresh uniform negative each.  A
      U-element permutation instead of an N-element one — measured 18x less
      sort work at the reference workload (20 interactions/user).
    - "pair_perm": permute the full interaction list (mixes strictly better
      than the reference; the previous default).
    - True / "bootstrap": sample interactions with replacement — the scheme
      of the original BPR paper (Rendle et al. 2009, LearnBPR "bootstrap
      sampling").  Cheapest (no permutation at all), statistically
      equivalent training.

    All schemes drop the unfilled tail batch (dataset.py:90-93).
    """
    mode = {False: "user_perm", True: "bootstrap"}.get(
        with_replacement, with_replacement
    )
    perm_key, neg_key = jax.random.split(key)
    n = train_pairs.shape[0]
    take = num_steps * batch_size
    if mode == "bootstrap":
        idx = jax.random.randint(perm_key, (take,), 0, n)
    elif mode == "pair_perm":
        idx = jax.random.permutation(perm_key, n)[:take]
    elif mode == "user_perm":
        U = pos_counts.shape[0]
        Pw = padded_pos.shape[1]
        perm = jax.random.permutation(perm_key, U)
        if n == U * Pw:
            # Uniform positive counts — provable from STATIC shapes alone
            # (sum(counts) == U * max(counts) forces every count == max).
            # Shuffle whole user RUNS instead of individual pairs: the
            # U-element permutation replaces the n-element one (18x less
            # sort work at the reference workload), and the negative-
            # sampler's padded_pos/count rows are gathered ONCE per user
            # and expanded contiguously.  The pair rows themselves gather
            # by EXPANDED run indices — an earlier `reshape(U, Pw*2)`
            # run-gather materialized a (8,128)-tiled copy of the whole
            # [n, 2] array (the 2-wide lane dim pads 64x: 10.7GB at the
            # 1M x 500k config, the capacity wall the round-5 ladder hit).
            # Ordering and PRNG draws are IDENTICAL to the generic path
            # below — same perm, same visit order, same neg key/shapes.
            idx_u = (
                perm[:, None] * Pw
                + jnp.arange(Pw, dtype=perm.dtype)[None, :]
            ).reshape(U * Pw)[:take]
            pairs_s = jnp.take(train_pairs, idx_u, axis=0)  # [take, 2]
            users = pairs_s[:, 0]
            pos = pairs_s[:, 1]
            rows_u = jnp.take(padded_pos, perm, axis=0)  # [U, Pw], once/user
            # identical u01 draw to the generic path (same key, same [take]
            # shape); counts are the static Pw everywhere
            u01 = jax.random.uniform(neg_key, (take,))
            c = num_items - Pw
            r = jnp.minimum(jnp.floor(u01 * c).astype(jnp.int32), c - 1)
            r_u = jnp.pad(r, (0, U * Pw - take)).reshape(U, Pw)
            shifted = rows_u - jnp.arange(Pw, dtype=jnp.int32)[None, :]
            # [U, Pw(draw), Pw(table)] compare+reduce fuses — never lands
            k = jnp.sum(
                shifted[:, None, :] <= r_u[:, :, None], axis=2,
                dtype=jnp.int32,
            )
            neg = (r_u + k).reshape(U * Pw)[:take]
            shape = (num_steps, batch_size)
            return (users.reshape(shape), pos.reshape(shape),
                    neg.reshape(shape))
        permuted_counts = jnp.take(pos_counts, perm)  # [U]
        out_starts = jnp.cumsum(permuted_counts) - permuted_counts
        row_starts = jnp.cumsum(pos_counts) - pos_counts  # user-major layout
        # segment of output slot j = (number of run starts <= j) - 1, via
        # scatter-add + cumsum (a binary search per slot lowers to a
        # log(U)-step gather loop on TPU — measured ~2x slower); zero-count
        # users collapse onto the next start and are skipped by the +2 jump
        delta = jnp.zeros(n + 1, jnp.int32).at[out_starts].add(1)
        seg = (jnp.cumsum(delta) - 1)[:take]
        within = jnp.arange(take, dtype=jnp.int32) - jnp.take(out_starts, seg)
        idx = jnp.take(row_starts, jnp.take(perm, seg)) + within
    else:
        raise ValueError(f"unknown sampling scheme {with_replacement!r}")
    pairs = jnp.take(train_pairs, idx, axis=0)
    users = pairs[:, 0]
    pos = pairs[:, 1]
    neg = sample_negatives(neg_key, users, padded_pos, pos_counts, num_items)
    shape = (num_steps, batch_size)
    return users.reshape(shape), pos.reshape(shape), neg.reshape(shape)
