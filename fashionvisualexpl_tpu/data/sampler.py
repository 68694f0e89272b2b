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


def derived_pairs_ok(train_pairs, padded_pos) -> bool:
    """Host-side eligibility check for sample_triplets(train_pairs=None).

    True iff the row-major flattening of ``padded_pos`` IS the user-major
    pair list: every user has exactly ``padded_pos.shape[1]`` positives
    stored in the padded rows' (ascending) order.  When this holds, the
    derived-pairs sampler is bit-identical to the materialized-pairs path
    for all three epoch schemes; the [N, 2] table need never reach HBM.
    """
    import numpy as np

    train_pairs = np.asarray(train_pairs)
    padded_pos = np.asarray(padded_pos)
    U, Pw = padded_pos.shape
    if train_pairs.shape != (U * Pw, 2):  # non-uniform counts exit here
        return False
    by_user = train_pairs.reshape(U, Pw, 2)
    if not bool((by_user[:, :, 0] == np.arange(U)[:, None]).all()):
        return False
    return bool((by_user[:, :, 1] == padded_pos).all())


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
    train_pairs: jax.Array,  # [N, 2] int32, USER-MAJOR contiguous; or None
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

    DERIVED-PAIRS capacity mode: ``train_pairs=None`` re-derives the pair
    list from ``padded_pos`` instead of reading a resident [N, 2] table —
    the dominant sampler-table footprint at the HBM capacity frontier
    (920MB of the ~2.3G at the 11.5M-row ladder ceiling, SPEED.md r5).
    Requires every user to have exactly ``padded_pos.shape[1]`` positives
    stored in ascending order — the row-major flattening of padded_pos IS
    then the user-major pair list, and all three schemes produce triples
    bit-identical to the materialized-pairs path (same PRNG draws, same
    visit order).  Callers verify eligibility host-side with
    ``derived_pairs_ok``.
    """
    mode = {False: "user_perm", True: "bootstrap"}.get(
        with_replacement, with_replacement
    )
    perm_key, neg_key = jax.random.split(key)
    derived = train_pairs is None
    n = padded_pos.shape[0] * padded_pos.shape[1] if derived \
        else train_pairs.shape[0]
    take = num_steps * batch_size
    if mode == "bootstrap":
        idx = jax.random.randint(perm_key, (take,), 0, n)
    elif mode == "pair_perm":
        idx = jax.random.permutation(perm_key, n)[:take]
    elif mode == "user_perm":
        U = pos_counts.shape[0]
        Pw = padded_pos.shape[1]
        perm = jax.random.permutation(perm_key, U)
        # PARTIAL epochs (take < n, e.g. fixed-step bench/ladder runs)
        # only ever consume the first ceil(take/Pw) permuted users' runs —
        # slice the permutation BEFORE the row gather and run expansions
        # so sampler transients scale with `take`, not the table (at the
        # 9M-row bf16 capacity run: ~1.4GB of [U*Pw] intermediates ->
        # ~25MB).  A full epoch has nu == U and nothing changes; outputs
        # are bit-identical either way (first-take elements only depend
        # on the first nu permuted users; PRNG draws keep their shapes).
        nu = min(U, -(-take // Pw)) if Pw else U
        if derived:
            # pair list re-derived from padded_pos: user k's run is row
            # perm[k] verbatim (uniform counts + sorted stored order make
            # this the exact user-major pair list).  Same perm/neg draws
            # and visit order as the materialized fast path below — and
            # FASTER: broadcast+reshape replaces the [take, 2] pair-table
            # gather (whose 2-wide lane dim gathers at 64x tile padding);
            # measured 114.1 -> 21.1 ms/epoch-sample at 1M x 500k, 200x8192
            # (jnp.repeat here was 170ms — it lowers to a real gather; the
            # broadcast is free).
            perm_u = perm[:nu]
            rows_u = jnp.take(padded_pos, perm_u, axis=0)  # [nu, Pw]
            users = jnp.broadcast_to(
                perm_u.astype(jnp.int32)[:, None], (nu, Pw)
            ).reshape(nu * Pw)[:take]
            pos = rows_u.reshape(nu * Pw)[:take]
            u01 = jax.random.uniform(neg_key, (take,))
            c = num_items - Pw
            r = jnp.minimum(jnp.floor(u01 * c).astype(jnp.int32), c - 1)
            r_u = jnp.pad(r, (0, nu * Pw - take)).reshape(nu, Pw)
            shifted = rows_u - jnp.arange(Pw, dtype=jnp.int32)[None, :]
            k = jnp.sum(
                shifted[:, None, :] <= r_u[:, :, None], axis=2,
                dtype=jnp.int32,
            )
            neg = (r_u + k).reshape(nu * Pw)[:take]
            shape = (num_steps, batch_size)
            return (users.reshape(shape), pos.reshape(shape),
                    neg.reshape(shape))
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
            perm_u = perm[:nu]
            idx_u = (
                perm_u[:, None] * Pw
                + jnp.arange(Pw, dtype=perm.dtype)[None, :]
            ).reshape(nu * Pw)[:take]
            # users need no gather at all (user-major uniform layout makes
            # train_pairs[k*Pw + t, 0] == k), and pos gathers the ITEM
            # COLUMN 1-D — a [take, 2] row gather pays 64x (8,128)-tile
            # padding on the 2-wide lane dim (measured 114.1 -> 34.3
            # ms/epoch-sample at 1M x 500k, 200x8192)
            users = jnp.broadcast_to(
                perm_u.astype(jnp.int32)[:, None], (nu, Pw)
            ).reshape(nu * Pw)[:take]
            pos = jnp.take(train_pairs[:, 1], idx_u)
            rows_u = jnp.take(padded_pos, perm_u, axis=0)  # [nu, Pw]
            # identical u01 draw to the generic path (same key, same [take]
            # shape); counts are the static Pw everywhere
            u01 = jax.random.uniform(neg_key, (take,))
            c = num_items - Pw
            r = jnp.minimum(jnp.floor(u01 * c).astype(jnp.int32), c - 1)
            r_u = jnp.pad(r, (0, nu * Pw - take)).reshape(nu, Pw)
            shifted = rows_u - jnp.arange(Pw, dtype=jnp.int32)[None, :]
            # [nu, Pw(draw), Pw(table)] compare+reduce fuses — never lands
            k = jnp.sum(
                shifted[:, None, :] <= r_u[:, :, None], axis=2,
                dtype=jnp.int32,
            )
            neg = (r_u + k).reshape(nu * Pw)[:take]
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
    shape = (num_steps, batch_size)
    if derived:
        # pair idx -> (user, slot) arithmetically; positives come from the
        # per-row gather the negative sampler needs anyway (shared below),
        # so no [N, 2] table is ever resident.
        Pw = padded_pos.shape[1]
        users = (idx // Pw).astype(jnp.int32)
        slot = (idx % Pw).astype(jnp.int32)
        rows = jnp.take(padded_pos, users, axis=0)  # [take, Pw]
        pos = jnp.take_along_axis(rows, slot[:, None], axis=1)[:, 0]
        counts = jnp.take(pos_counts, users)
        neg = _negatives_from_rows(neg_key, rows, counts, num_items)
        return users.reshape(shape), pos.reshape(shape), neg.reshape(shape)
    pairs = jnp.take(train_pairs, idx, axis=0)
    users = pairs[:, 0]
    pos = pairs[:, 1]
    neg = sample_negatives(neg_key, users, padded_pos, pos_counts, num_items)
    return users.reshape(shape), pos.reshape(shape), neg.reshape(shape)
