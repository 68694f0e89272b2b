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
import numpy as np


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


def _bucket_positions(banned, num_items, blk):
    """Shared bucketing core: per banned id, its (block, position-in-block
    -group) under a stable per-row sort by block.  Invalid ids (outside
    [0, num_items)) sort into a past-the-end bucket."""
    Bu, Pb = banned.shape
    n_blocks = -(-num_items // blk)
    in_range = (banned >= 0) & (banned < num_items)
    block_of = np.where(in_range, banned // blk, n_blocks)
    order = np.argsort(block_of, axis=1, kind="stable")
    sb = np.take_along_axis(block_of, order, axis=1)
    sid = np.take_along_axis(banned, order, axis=1)
    idx = np.arange(Pb)
    change = np.empty((Bu, Pb), bool)
    change[:, 0] = True
    if Pb > 1:
        change[:, 1:] = sb[:, 1:] != sb[:, :-1]
    start = np.maximum.accumulate(np.where(change, idx[None, :], 0), axis=1)
    pos = idx[None, :] - start  # position within the (user, block) group
    return n_blocks, sb, sid, pos, sb < n_blocks


def banned_bucket_width(
    banned_ids, num_items: int, item_block: int, chunk: int = 65536
) -> int:
    """Max ids any one user has in any one item block (the static W for
    bucket_banned_ids), computed in user chunks so 10^6-user tables never
    materialize the full bucket tensor."""
    banned = np.asarray(banned_ids)
    blk = min(item_block, num_items)
    W = 1
    for s in range(0, banned.shape[0], chunk):
        _, _, _, pos, valid = _bucket_positions(
            banned[s:s + chunk], num_items, blk
        )
        if valid.any():
            W = max(W, int(pos[valid].max()) + 1)
    return W


def bucket_banned_ids(
    banned_ids, num_items: int, item_block: int, width: Optional[int] = None
):
    """Bucket per-user banned ids by item block (host-side, numpy).

    The mask pass of streaming_counts compares every item id in a block
    against EVERY banned id of every user — O(Bu x blk x Pb) VPU work even
    though a given block can only contain the few banned ids that fall in
    its id range (~Pb x blk/I per user on average).  Pre-bucketing the
    banned lists by block turns that into O(Bu x blk x W) with
    W = max ids any user has in any one block (typically 2-8 at the
    benchmark geometry vs Pb ~ 41-81).

    Returns (local [n_blocks, Bu, W] int32 block-LOCAL offsets,
    valid [n_blocks, Bu, W] bool).  Ids outside [0, num_items) (the pad
    convention, e.g. -1) are dropped.  Semantics are duplicate-safe: the
    consumer ORs equality over W exactly like the unbucketed mask pass.
    `width` pins W (keeps jit shapes static across user blocks — probe
    with banned_bucket_width); raises if any bucket overflows it.
    """
    banned = np.asarray(banned_ids)
    Bu, Pb = banned.shape
    blk = min(item_block, num_items)
    n_blocks, sb, sid, pos, valid_e = _bucket_positions(
        banned, num_items, blk
    )
    w_needed = int(pos[valid_e].max()) + 1 if valid_e.any() else 1
    W = width if width is not None else max(1, w_needed)
    if w_needed > W:
        raise ValueError(f"bucket width {w_needed} exceeds pinned {W}")

    local = np.zeros((n_blocks, Bu, W), np.int32)
    valid = np.zeros((n_blocks, Bu, W), bool)
    u_idx = np.broadcast_to(np.arange(Bu)[:, None], (Bu, Pb))
    b, u, p = sb[valid_e], u_idx[valid_e], pos[valid_e]
    local[b, u, p] = (sid[valid_e] - b * blk).astype(np.int32)
    valid[b, u, p] = True
    return local, valid


def bucket_banned_ids_device(
    banned: jax.Array,  # [Bu, Pb] int32, pad < 0 or >= num_items
    num_items: int,
    item_block: int,
    width: int,
    return_overflow: bool = False,
):
    """bucket_banned_ids as a pure jnp function (jit/TPU-resident).

    The evaluator calls this INSIDE its jitted block fn: host-side
    bucketing would ship [n_blocks, Bu, W] tensors through the
    host->device link every user block, which measured 6x slower than
    the unbucketed kernel on the remote-tunnel platform.  `width` must
    come from a banned_bucket_width probe (static) — unlike the host
    version this function cannot raise inside jit, so an id whose
    in-block rank reaches `width` is DROPPED (it would then be counted as
    a negative and corrupt AUC/ranks).  Callers whose width is not
    probe-backed must pass ``return_overflow=True`` and check the third
    output (the number of dropped ids) — the loud-failure analogue of
    bucket_banned_ids' ValueError.

    Scatter-free formulation: position-in-group by counting earlier
    same-tile ids (O(Pb^2) elementwise, Pb is small) and placement by two
    tiny batched matmuls — an argsort+scatter version measured ~2.6ms per
    4096-user block on TPU, comparable to the count kernel it feeds.
    """
    Bu, Pb = banned.shape
    blk = min(item_block, num_items)
    n_blocks = -(-num_items // blk)
    in_range = jnp.logical_and(banned >= 0, banned < num_items)
    tile = jnp.where(in_range, banned // blk, -1)  # -1: matches no block
    # rank among earlier ids in the same (user, tile) group
    same_earlier = jnp.logical_and(
        tile[:, :, None] == tile[:, None, :],
        jnp.arange(Pb)[None, None, :] < jnp.arange(Pb)[None, :, None],
    )
    pos = same_earlier.sum(axis=2, dtype=jnp.int32)  # [Bu, Pb]
    a = (
        tile[:, None, :] == jnp.arange(n_blocks, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32)  # [Bu, n_blocks, Pb]
    b_slot = jnp.logical_and(
        pos[:, :, None] == jnp.arange(width, dtype=jnp.int32)[None, None, :],
        in_range[:, :, None],
    ).astype(jnp.float32)  # [Bu, Pb, W]
    local_val = (banned - tile * blk).astype(jnp.float32)
    # HIGHEST precision: local offsets reach item_block-1, beyond bf16's
    # 8-bit mantissa — the TPU DEFAULT-precision matmul would corrupt
    # them; full f32 is exact to 2^24 and each (tile, slot) pair is hit
    # by at most one id
    hi = jax.lax.Precision.HIGHEST
    loc = jnp.einsum(
        "utp,upw->tuw", a, b_slot * local_val[:, :, None], precision=hi
    )
    msk = jnp.einsum("utp,upw->tuw", a, b_slot, precision=hi) > 0.5
    if return_overflow:
        overflow = jnp.sum(
            jnp.logical_and(in_range, pos >= width), dtype=jnp.int32
        )
        return loc.astype(jnp.int32), msk, overflow
    return loc.astype(jnp.int32), msk


def streaming_counts_bucketed(
    user_vecs: jax.Array,  # [Bu, D]
    item_vecs: jax.Array,  # [I, D]
    item_bias: Optional[jax.Array],  # [I] or None
    ref_scores: jax.Array,  # [Bu, T]
    banned_local: jax.Array,  # [n_blocks, Bu, W] block-local banned offsets
    banned_valid: jax.Array,  # [n_blocks, Bu, W]
    item_block: int = 4096,
) -> jax.Array:
    """streaming_counts with PRE-BUCKETED banned ids (bucket_banned_ids).

    Bit-identical counts to streaming_counts on the same banned set
    (pinned in tests); the per-block exclusion compare shrinks from the
    full banned width Pb to the max-per-block width W.  banned_local's
    leading dim must equal this call's block count — under the sharded
    evaluator, shard it over `model` alongside the item rows so each
    shard scans exactly its own buckets.
    """
    Bu, D = user_vecs.shape
    I = item_vecs.shape[0]
    blk = min(item_block, I)
    n_blocks = -(-I // blk)
    pad = n_blocks * blk - I
    if banned_local.shape[0] != n_blocks:
        raise ValueError(
            f"banned buckets built for {banned_local.shape[0]} blocks, "
            f"scan has {n_blocks}"
        )

    iv = jnp.pad(item_vecs, ((0, pad), (0, 0)))
    ib = (
        jnp.pad(item_bias, (0, pad)) if item_bias is not None
        else jnp.zeros((n_blocks * blk,), user_vecs.dtype)
    )
    iv_blocks = iv.reshape(n_blocks, blk, D)
    ib_blocks = ib.reshape(n_blocks, blk)
    valid = (jnp.arange(n_blocks * blk) < I).reshape(n_blocks, blk)
    local_iota = jnp.arange(blk, dtype=jnp.int32)

    def body(counts, xs):
        iv_b, ib_b, valid_b, loc_b, val_b = xs
        scores = user_vecs @ iv_b.T + ib_b[None, :]  # [Bu, blk] (MXU)
        is_banned = jnp.logical_and(
            local_iota[None, :, None] == loc_b[:, None, :],
            val_b[:, None, :],
        ).any(axis=2)  # [Bu, blk]
        ge = jnp.logical_and(
            jnp.logical_and(
                scores[:, :, None] >= ref_scores[:, None, :],
                jnp.logical_not(is_banned)[:, :, None],
            ),
            valid_b[None, :, None],
        ).sum(axis=1, dtype=jnp.int32)
        return counts + ge, None

    counts, _ = jax.lax.scan(
        body, jnp.zeros(ref_scores.shape, jnp.int32),
        (iv_blocks, ib_blocks, valid, banned_local, banned_valid),
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
