"""Low-latency recommendation serving on TPU.

The reference's only "serving" surface is the offline top-k dump
(`Evaluator.store_recommendation`, reference Evaluator.py:225-239): it
materializes the full [U, I] score matrix on one device, masks each user's
train items with -inf and heapq's per user on the host.  A production
deployment needs the inverse shape — an index built once per model publish
that answers small user batches at low latency.  This module provides that
TPU-natively:

- **refresh(params, frozen)** builds the device-resident index once per
  publish: factored user/item matrices (`model.factored_eval`) for the five
  factored models, or the model's `precompute_eval` context (e.g.
  AttentiveFashion's encoded item stack) for pointwise models.
- **query(user_ids)** is one jitted program per batch-size bucket, in two
  stages: (1) candidate generation at hardware-native matmul precision —
  blocked MXU scoring + streaming top-(oversample * (k + max_train))
  (`approx_max_k` recall 1.0 lowers to PartialReduce, not a full sort) —
  and (2) exact fp32 rescoring (`Precision.HIGHEST`) of those candidates,
  per-user interaction-history filter (the same by-ID exclusion the
  evaluator uses — no [U, I] mask is ever built), final top-k.  The
  two-stage split matters on TPU: fp32 matmuls use bf16 multiplies by
  default (~1e-3 relative error), so candidate scores are approximate; the
  oversampled horizon absorbs the displacement and the rescore makes the
  served ranking the true fp32 ranking, independent of the generation path.
- **quantized=True** swaps the candidate stage to int8: both factor
  matrices symmetrically quantized per row, candidate scores accumulated
  in int32 on the MXU's double-rate int8 path.  Same rescore, same served
  ranking (tested; `oversample` controls the displacement margin).

Query batches are padded to power-of-two buckets so XLA compiles a handful
of programs, not one per batch size.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import Interactions, pad_lists
from fashionvisualexpl_tpu.ops.topk import (
    OUT_OF_RANGE_ID,
    _merge_topk,
    filter_items_topk,
    streaming_topk_and_counts,
)


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: returns (q [N, D] int8,
    scale [N] fp32) with x ~= q * scale[:, None]."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def _quantized_topc(qu, su, q_items, s_items, item_bias, c, item_block):
    """Top-c candidate ids/scores from int8 factors, blocked over items.

    Scores are (int8 @ int8 -> int32) * row scales + bias — the MXU int8
    path at double the bf16 rate; structure mirrors
    ops/topk.streaming_topk_and_counts (same merge, same sentinel ids).
    """
    B = qu.shape[0]
    I = q_items.shape[0]
    blk = min(item_block, I)
    n_blocks = -(-I // blk)
    pad = n_blocks * blk - I

    qi = jnp.pad(q_items, ((0, pad), (0, 0)))
    si = jnp.pad(s_items, (0, pad))
    ib = (
        jnp.pad(item_bias, (0, pad)) if item_bias is not None
        else jnp.zeros((n_blocks * blk,), jnp.float32)
    )
    valid = (jnp.arange(n_blocks * blk) < I).reshape(n_blocks, blk)
    qi = qi.reshape(n_blocks, blk, qi.shape[1])
    si = si.reshape(n_blocks, blk)
    ibb = ib.reshape(n_blocks, blk)

    cb = min(c, blk)
    init_v = jnp.full((B, c), -jnp.inf, jnp.float32)
    init_i = jnp.full((B, c), OUT_OF_RANGE_ID, jnp.int32)

    def body(carry, xs):
        rv, ri = carry
        qi_b, si_b, ib_b, valid_b, base = xs
        acc = jax.lax.dot_general(
            qu, qi_b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [B, blk] int32
        s = acc.astype(jnp.float32) * su[:, None] * si_b[None, :] + ib_b[None, :]
        s = jnp.where(valid_b[None, :], s, -jnp.inf)
        bv, bp = jax.lax.approx_max_k(s, cb, recall_target=1.0)
        bi = bp.astype(jnp.int32) + base
        bi = jnp.where(jnp.isneginf(bv), OUT_OF_RANGE_ID, bi)
        rv, ri = _merge_topk(rv, ri, bv, bi, c)
        return (rv, ri), None

    bases = jnp.arange(n_blocks, dtype=jnp.int32) * blk
    (tv, ti), _ = jax.lax.scan(body, (init_v, init_i), (qi, si, ibb, valid, bases))
    return tv, ti


class RecServer:
    """Index-and-query recommendation server.

    Parameters
    ----------
    model : any framework model.  Factored models (``factored_eval``) get the
        streaming index path; others fall back to ``predict_user_block`` over
        the model's ``precompute_eval`` context.
    data : Interactions — supplies each user's train history for exclusion
        (the `store_recommendation` protocol: train items never served).
    k : recommendations per query.
    item_block : item-axis block for the streaming scans.
    quantized : enable the int8 candidate-generation stage (factored only).
    oversample : candidate-set size multiplier for the quantized path
        (candidates = oversample * (k + max_train), clamped to the catalog).
    """

    def __init__(
        self,
        model,
        data: Interactions,
        k: int = 20,
        item_block: int = 8192,
        quantized: bool = False,
        oversample: int = 4,
        max_batch: int = 4096,
    ):
        self.model = model
        self.data = data
        self.k = k
        self.item_block = item_block
        self.quantized = quantized
        self.oversample = oversample
        self.max_batch = max_batch

        train_padded, train_counts = pad_lists(data.training_list, pad_value=0)
        self._train_items = jnp.asarray(train_padded)  # [U, P]
        self._train_counts = jnp.asarray(train_counts)  # [U]
        self._P = int(train_padded.shape[1])
        self._k_big = min(data.num_items, k + self._P)
        if k > self._k_big:
            raise ValueError(f"k={k} exceeds catalog size {data.num_items}")

        self._factored = hasattr(model, "factored_eval")
        self._index = None  # set by refresh()
        if self._factored:
            self._query_fn = jax.jit(
                self._quant_query if quantized else self._exact_query
            )
        else:
            self._query_fn = jax.jit(self._direct_query)

    # --- index build -----------------------------------------------------

    def refresh(self, params, frozen) -> None:
        """(Re)build the serving index from a trained state — once per model
        publish, off the query path."""
        U, I = self.data.num_users, self.data.num_items
        if self._factored:
            uf, iv, ib = self.model.factored_eval(params, frozen)
            # sharded tables are row-padded to the mesh multiple — strip
            uf, iv = uf[:U], iv[:I]
            ib = None if ib is None else ib[:I]
            index = {"uf": uf, "iv": iv, "ib": ib}
            if self.quantized:
                q_items, s_items = quantize_rows(iv)
                index.update(q_items=q_items, s_items=s_items)
            self._index = jax.device_put(index)
        else:
            ctx = self.model.precompute_eval(params, frozen)
            self._index = {"params": params, "frozen": frozen, "ctx": ctx}

    # --- jitted query bodies ---------------------------------------------

    def _rescore(self, index, uf, ti):
        """True-fp32 scores of a candidate set.  TPU fp32 matmuls use bf16
        multiplies by default (~1e-3 relative error) — fine for candidate
        GENERATION, but served scores/rankings must not depend on which
        generation path ran, so the final candidates are rescored at
        Precision.HIGHEST (exact fp32) in both paths."""
        safe = jnp.where(ti == OUT_OF_RANGE_ID, 0, ti)
        cand = jnp.take(index["iv"], safe, axis=0)  # [B, C, D]
        s = jnp.einsum(
            "bd,bcd->bc", uf, cand, precision=jax.lax.Precision.HIGHEST
        )
        if index["ib"] is not None:
            s = s + jnp.take(index["ib"], safe)
        return jnp.where(ti == OUT_OF_RANGE_ID, -jnp.inf, s)

    def _filtered_topk(self, index, uf, ti, user_ids):
        s = self._rescore(index, uf, ti)
        banned = jnp.take(self._train_items, user_ids, axis=0)
        counts = jnp.take(self._train_counts, user_ids)
        return filter_items_topk(s, ti, banned, counts, self.k)

    @property
    def _num_candidates(self) -> int:
        # candidate generation runs at hardware-native precision (TPU fp32
        # matmul = bf16 multiplies; int8 when quantized), which can displace
        # near-tied items — the oversampled horizon + fp32 rescore absorbs it
        return min(self.data.num_items, self.oversample * self._k_big)

    def _exact_query(self, index, user_ids):
        uf = jnp.take(index["uf"], user_ids, axis=0)
        _, ti, _ = streaming_topk_and_counts(
            uf, index["iv"], index["ib"], self._num_candidates,
            item_block=self.item_block,
        )
        return self._filtered_topk(index, uf, ti, user_ids)

    def _quant_query(self, index, user_ids):
        uf = jnp.take(index["uf"], user_ids, axis=0)
        qu, su = quantize_rows(uf)
        _, ti = _quantized_topc(
            qu, su, index["q_items"], index["s_items"], index["ib"],
            self._num_candidates, self.item_block,
        )
        return self._filtered_topk(index, uf, ti, user_ids)

    def _direct_query(self, index, user_ids):
        I = self.data.num_items
        scores = self.model.predict_user_block(
            index["params"], index["frozen"], user_ids, index["ctx"]
        )[:, :I]
        banned = jnp.take(self._train_items, user_ids, axis=0)
        counts = jnp.take(self._train_counts, user_ids)
        # pad slots -> id I, dropped by the scatter (never a catalog column)
        P = banned.shape[1]
        drop = jnp.where(jnp.arange(P)[None, :] < counts[:, None], banned, I)
        B = scores.shape[0]
        scores = scores.at[jnp.arange(B)[:, None], drop].set(
            -jnp.inf, mode="drop"
        )
        vals, idx = jax.lax.approx_max_k(scores, self.k, recall_target=1.0)
        return vals, idx.astype(jnp.int32)

    # --- public query surface --------------------------------------------

    def query(self, user_ids) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, scores) for a batch of user ids.  Batches pad to
        power-of-two buckets (bounded compile count); oversize batches chunk
        at ``max_batch``."""
        if self._index is None:
            raise RuntimeError("RecServer.refresh(params, frozen) not called")
        user_ids = np.asarray(user_ids, np.int32).reshape(-1)
        if user_ids.size == 0:
            return (
                np.zeros((0, self.k), np.int32),
                np.zeros((0, self.k), np.float32),
            )
        if user_ids.size > self.max_batch:
            parts = [
                self.query(user_ids[s : s + self.max_batch])
                for s in range(0, user_ids.size, self.max_batch)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        n = user_ids.size
        bucket = max(8, 1 << (n - 1).bit_length())
        padded = np.zeros(bucket, np.int32)
        padded[:n] = user_ids
        vals, ids = self._query_fn(self._index, jnp.asarray(padded))
        return np.asarray(ids)[:n], np.asarray(vals)[:n]

    def query_user(self, user_id: int) -> List[Tuple[int, float]]:
        ids, vals = self.query([user_id])
        return [(int(i), float(v)) for i, v in zip(ids[0], vals[0])]
