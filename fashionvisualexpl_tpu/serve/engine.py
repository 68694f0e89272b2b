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
- **query(user_ids)** is one jitted program per batch-size bucket, in three
  stages:
  1. *segment-max candidate generation*: catalog scores stream in blocks at
     hardware-native matmul precision; each block immediately max-pools over
     R-item segments (an elementwise reduction XLA fuses into the matmul
     epilogue — per-item top-k machinery was measured 10-30x slower than
     the scoring matmul itself).  One `approx_max_k` (recall 1.0 — exact,
     lowers to PartialReduce, not a sort) over the R-times-smaller segment
     matrix picks the top segments; all R items of each winning segment
     become candidates.  Ranking segments by max provably recovers the true
     top-m items within the top-m segments.
  2. *exact fp32 rescore* (`Precision.HIGHEST`) of the candidates: TPU fp32
     matmuls use bf16 multiplies by default (~1e-3 relative error), so
     stage-1 scores are approximate; the segment margin (`oversample`)
     absorbs the displacement and the rescore makes the served ranking the
     true fp32 ranking, independent of the generation path.
  3. per-user interaction-history filter (the same by-ID exclusion the
     evaluator uses — no [U, I] mask is ever built) and final top-k.
- **quantized=True** swaps stage 1's matmul to int8: both factor matrices
  symmetrically quantized per row, scores accumulated in int32 on the MXU's
  double-rate int8 path.  Same rescore, same served ranking (tested).

Query batches are padded to power-of-two buckets so XLA compiles a handful
of programs, not one per batch size.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import Interactions, pad_lists
from fashionvisualexpl_tpu.ops.topk import OUT_OF_RANGE_ID


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: returns (q [N, D] int8,
    scale [N] fp32) with x ~= q * scale[:, None]."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


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
    item_block : item-axis block for the streaming scoring scan.
    quantized : int8 candidate generation (factored models only).
    oversample : segment-horizon multiplier — candidates come from the top
        ``oversample * (k + max_train)`` segments (clamped to the catalog);
        >=2 leaves margin for low-precision score displacement.
    seg : segment width R of the max-pool (catalog items per candidate
        segment); candidates per query = k_seg * seg.
    history : optional precomputed (padded_train_items [U, P],
        train_counts [U]) arrays, overriding the pad of
        ``data.training_list`` — for deployments that already hold the
        padded form.
    """

    def __init__(
        self,
        model,
        data: Interactions,
        k: int = 20,
        item_block: int = 65536,
        quantized: bool = False,
        oversample: int = 2,
        seg: int = 32,
        superseg: int = 1,
        max_batch: int = 4096,
        rescore_chunk: int = 128,
        history: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        mesh=None,
        segmax_kernel: Optional[str] = None,
        stage1_dtype: str = "bf16",
        segmax_transposed: Optional[bool] = None,
    ):
        self._superseg = superseg
        # stage-1 scoring precision: "bf16" (default — candidate displacement
        # absorbed by the oversample margin + fp32 rescore) or "fp32" (exact
        # candidate generation — the segment-max bound then guarantees the
        # served top-k IS the true fp32 top-k, no margin needed)
        if stage1_dtype not in ("bf16", "fp32"):
            raise ValueError(f"stage1_dtype must be bf16|fp32, got {stage1_dtype}")
        self._stage1_dtype = (
            jnp.bfloat16 if stage1_dtype == "bf16" else jnp.float32
        )
        # stage-1 fused matmul+segment-max Pallas kernel (ops/segmax.py):
        # None = auto (on TPU, off elsewhere), "on", "off", "interpret"
        # (Pallas interpreter — CPU test path)
        if segmax_kernel is None:
            segmax_kernel = (
                "on" if jax.devices()[0].platform == "tpu" else "off"
            )
        self._segmax_kernel = segmax_kernel
        # [B, S]-major kernel output (per-tile VMEM transpose) so the
        # downstream approx_max_k pays no relayout; None = auto (small
        # batches, where the round-4 xplane showed 1.11ms of the 4.0ms
        # B=8 device cost in the [S, B]-major top-k)
        self._segmax_transposed = segmax_transposed
        self.model = model
        self.data = data
        self.k = k
        self.quantized = quantized
        self.oversample = oversample
        self.seg = min(seg, data.num_items)
        self.max_batch = max_batch
        self.rescore_chunk = rescore_chunk
        self.mesh = mesh
        # block must hold whole segments
        self.item_block = max(self.seg, (item_block // self.seg) * self.seg)

        if history is not None:
            train_padded, train_counts = history
        else:
            train_padded, train_counts = pad_lists(
                data.training_list, pad_value=0
            )
        self._train_items = jnp.asarray(train_padded)  # [U, P]
        self._train_counts = jnp.asarray(train_counts)  # [U]
        self._P = int(train_padded.shape[1])
        k_big = k + self._P
        if k > data.num_items:
            raise ValueError(f"k={k} exceeds catalog size {data.num_items}")
        self._factored = hasattr(model, "factored_eval")
        if mesh is not None and not self._factored:
            raise ValueError(
                "mesh serving requires a factored model (factored_eval)"
            )
        # static block geometry, PER SHARD: each shard's item slice pads (at
        # refresh) to a whole number of blocks, each a whole number of
        # segments; under a mesh the catalog shards over `model`
        from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

        I = data.num_items
        m = 1 if mesh is None else mesh.shape[MODEL_AXIS]
        local_span = -(-I // m)
        self._blk = min(
            self.item_block, -(-local_span // self.seg) * self.seg
        )
        self._local_padded = -(-local_span // self._blk) * self._blk
        self._padded_items = self._local_padded * m
        local_segments = self._local_padded // self.seg
        # cover k from this shard's slice where possible; when a shard's
        # whole slice holds fewer than k items, _filtered_topk pads its
        # result to k with -inf so the cross-shard merge still works
        self._k_seg = min(
            local_segments,
            max(self.oversample * k_big, -(-k // self.seg)),
        )
        # rescore chunking reshapes power-of-two batch buckets evenly
        self.rescore_chunk = 1 << (max(1, self.rescore_chunk) - 1).bit_length()

        self._index = None  # set by refresh()
        if mesh is not None:
            self._query_fn = jax.jit(self._sharded_query)
        else:
            self._query_fn = jax.jit(
                self._factored_query if self._factored else self._direct_query
            )
            # history rows gather in its OWN tiny program: see
            # _filtered_topk's hist docstring (per-call whole-table
            # relayout otherwise)
            self._hist_fn = jax.jit(
                lambda banned, counts, ids: (
                    jnp.take(banned, ids, axis=0), jnp.take(counts, ids)
                )
            )

    # --- index build -----------------------------------------------------

    def refresh(self, params, frozen) -> None:
        """(Re)build the serving index from a trained state — once per model
        publish, off the query path.

        Everything the query touches lives in the index DICT and rides into
        the jitted query as an argument: a large array captured as a jit
        closure constant measured a fixed ~32 ms/call on this platform
        (re-shipped through the remote-device tunnel), so nothing big may be
        captured by closure."""
        U, I = self.data.num_users, self.data.num_items
        # history tables are part of the index for exactly that reason
        index = {"banned": self._train_items, "banned_counts": self._train_counts}
        if self._factored:
            uf, iv, ib = self.model.factored_eval(params, frozen)
            # sharded tables are row-padded to the mesh multiple — strip,
            # then pad to the static block geometry ONCE here (padding
            # inside the query would copy the whole catalog per call)
            uf, iv = uf[:U], iv[:I]
            ib = None if ib is None else ib[:I]
            seg, D = self.seg, iv.shape[1]
            Ip = self._padded_items
            S = Ip // seg
            iv_pad = jnp.pad(iv, ((0, Ip - I), (0, 0)))
            index.update(
                uf=uf,
                # stage-2 rescore copy: segment-major fp32 — all `seg` rows
                # of one candidate segment in ONE contiguous gather row
                # (seg*D*4B DMA per segment instead of `seg` scattered row
                # DMAs — row gathers are DMA-issue-latency bound at
                # ~80ns/row, SPEED.md)
                iv_seg=iv_pad.reshape(S, seg * D),
            )
            if not self.quantized:
                # stage-1 scoring copy: bf16 by default — full MXU rate,
                # half the HBM traffic; candidate displacement is absorbed
                # by the oversample margin and the fp32 rescore.  fp32 when
                # stage1_dtype="fp32" (exact candidates).  The quantized
                # path scores from q_items instead (4x smaller still)
                index["iv_cand"] = iv_pad.astype(self._stage1_dtype)
            ib_pad = jnp.pad(ib, (0, Ip - I)) if ib is not None else None
            index["ib_pad"] = ib_pad  # None folds out of the pytree
            index["ib_seg"] = (
                ib_pad.reshape(S, seg) if ib is not None else None
            )
            # bias + validity folded into one vector: pad items carry a
            # large negative so the fused segmax kernel stays branch-free
            index["ib_cand"] = jnp.where(
                jnp.arange(Ip) < I,
                ib_pad if ib is not None else jnp.zeros((Ip,), jnp.float32),
                -1e30,
            ).astype(jnp.float32)
            if self.quantized:
                q_items, s_items = quantize_rows(iv)
                index.update(
                    q_items=jnp.pad(q_items, ((0, Ip - I), (0, 0))),
                    s_items=jnp.pad(s_items, (0, Ip - I)),
                )
            self._index = jax.device_put(index, self._index_shardings(index))
        else:
            ctx = self.model.precompute_eval(params, frozen)
            index.update(params=params, frozen=frozen, ctx=ctx)
            self._index = index

    def _index_partition_specs(self, index):
        """PartitionSpec per index key: catalog arrays shard their item/
        segment axis over `model`; user-side tables replicate."""
        from jax.sharding import PartitionSpec as P

        from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

        item_sharded = {
            "iv_cand": P(MODEL_AXIS, None), "iv_seg": P(MODEL_AXIS, None),
            "q_items": P(MODEL_AXIS, None), "ib_seg": P(MODEL_AXIS, None),
            "ib_pad": P(MODEL_AXIS), "s_items": P(MODEL_AXIS),
            "ib_cand": P(MODEL_AXIS),
        }
        return {
            k: (None if v is None else item_sharded.get(k, P()))
            for k, v in index.items()
        }

    def _index_shardings(self, index):
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding

        return {
            k: (None if s is None else NamedSharding(self.mesh, s))
            for k, s in self._index_partition_specs(index).items()
        }

    # --- jitted query bodies ---------------------------------------------

    def _candidates(self, index, uf, item_offset=0):
        """Stage 1: candidate ids [B, k_seg*seg] via segment-max streaming.

        The per-block work is ONLY matmul + reshape + max; the single top-k
        runs over the seg-times reduced [B, S] segment matrix.  All padding
        and dtype conversion of the catalog happened at refresh().

        `item_offset` is this shard's global base (0 single-device);
        returned ids are GLOBAL, while the returned segment ids stay LOCAL
        (stage 2 gathers from this shard's segment-major copy)."""
        I = self.data.num_items
        seg, blk, Ip = self.seg, self._blk, self._local_padded
        n_blocks = Ip // blk

        # fused matmul + segment-max Pallas kernel: scores stay in VMEM (the
        # XLA scan below materializes each [B, blk] block to HBM before the
        # reduce — measured ~6x the matmul cost).  Compiled mode needs the
        # output block's segment dim to be a lane multiple: item_tile =
        # seg*128; interpret mode (CPU tests) takes any geometry.
        if (
            not self.quantized
            and self._stage1_dtype == jnp.bfloat16
            and self._segmax_kernel in ("on", "interpret")
        ):
            interp = self._segmax_kernel == "interpret"
            ti = blk if interp else seg * 128
            if not interp and uf.shape[0] <= 256:
                # small batches: the kernel's per-grid-step overhead
                # dominates at the minimum lane-aligned tile (244 steps at
                # tile 4096 over a 1M catalog measured 25.5ms at B<=8 while
                # the int8 XLA scan did 1.9ms) — widen the tile so the grid
                # shrinks; VMEM/step stays small because the score block is
                # [min(128,B), tile]; tile 16384 stays under the 16MB
                # scoped-VMEM limit (32768 measured 16.25MB: OOM).
                # B>=1024 keeps the measured-optimal 4096.
                while ti * 2 <= 16384 and Ip % (ti * 2) == 0:
                    ti *= 2
            if Ip % ti == 0:
                from fashionvisualexpl_tpu.ops.segmax import segmax_scores

                transposed = self._segmax_transposed
                if transposed is None:
                    # measured: the in-VMEM tile transpose wins at small B
                    # (see SPEED.md round-5 serving section)
                    transposed = uf.shape[0] <= 256
                segmax = segmax_scores(
                    uf.astype(jnp.bfloat16), index["iv_cand"],
                    index["ib_cand"], seg, item_tile=ti, interpret=interp,
                    transposed_out=transposed,
                )
                return self._ids_from_segments(segmax, seg, I, item_offset)

        if self.quantized:
            qi_b = index["q_items"].reshape(n_blocks, blk, -1)
            si_b = index["s_items"].reshape(n_blocks, blk)
            qu, su = quantize_rows(uf)
        else:
            iv_b = index["iv_cand"].reshape(n_blocks, blk, -1)
            uf_c = uf.astype(self._stage1_dtype)
        ib_pad = index["ib_pad"]
        ibb = (
            ib_pad.reshape(n_blocks, blk)
            if ib_pad is not None
            else jnp.zeros((n_blocks, blk), jnp.float32)
        )
        # pad slots score -inf so they never win a segment max
        valid = ((jnp.arange(Ip) + item_offset) < I).reshape(n_blocks, blk)

        def body(_, xs):
            if self.quantized:
                qi_x, si_x, ib_x, valid_x = xs
                acc = jax.lax.dot_general(
                    qu, qi_x, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = acc.astype(jnp.float32) * su[:, None] * si_x[None, :]
            else:
                # bf16 scores throughout (default): the [B, blk] block
                # materializes to HBM before the max — half the traffic, and
                # stage-1 precision is irrelevant (oversample margin + fp32
                # rescore).  fp32 mode scores exactly (HIGHEST precision)
                iv_x, ib_x, valid_x = xs
                exact = self._stage1_dtype == jnp.float32
                s = jax.lax.dot_general(
                    uf_c, iv_x, (((1,), (1,)), ((), ())),
                    preferred_element_type=self._stage1_dtype,
                    precision=(
                        jax.lax.Precision.HIGHEST if exact else None
                    ),
                )
                s = s + ib_x[None, :].astype(self._stage1_dtype)
                s = jnp.where(valid_x[None, :], s, -jnp.inf)
                segmax = s.reshape(s.shape[0], blk // seg, seg).max(axis=2)
                return None, segmax.astype(jnp.float32)
            s = s + ib_x[None, :]
            s = jnp.where(valid_x[None, :], s, -jnp.inf)
            segmax = s.reshape(s.shape[0], blk // seg, seg).max(axis=2)
            return None, segmax

        xs = (
            (qi_b, si_b, ibb, valid) if self.quantized else (iv_b, ibb, valid)
        )
        _, segmax = jax.lax.scan(body, None, xs)  # [n_blocks, B, blk/seg]
        B = uf.shape[0]
        segmax = jnp.moveaxis(segmax, 0, 1).reshape(B, -1)  # [B, S_total]
        return self._ids_from_segments(segmax, seg, I, item_offset)

    def _ids_from_segments(self, segmax, seg, I, item_offset):
        B = segmax.shape[0]
        seg_ids = self._select_segments(segmax)  # [B, k_seg] local ids
        cand = (
            seg_ids[:, :, None] * seg
            + jnp.arange(seg, dtype=jnp.int32)[None, None, :]
        ).reshape(B, -1) + item_offset  # [B, k_seg*seg] global
        return jnp.where(cand < I, cand, OUT_OF_RANGE_ID), seg_ids

    def _select_segments(self, segmax):
        """Top-k_seg segment ids from a [B, S] segment-max matrix.

        For large S, select hierarchically: max-pool segments into
        super-segments of `_superseg`, approx_max_k over the S/superseg
        matrix, then a second (tiny) selection within the winners' pools.
        Coverage argument as for items->segments: the super-segment holding
        the i-th best segment ranks <= i by super-max, so the top-k_seg
        super-segments contain the top-k_seg segments.

        MEASURED NEGATIVE at the 1M-item bench (in-context A/B, B=4096):
        flat 234ms < superseg=8 253ms < superseg=16 304ms — the per-row
        pool gathers and extra selection cost more than the smaller
        approx_max_k saves (a standalone microbenchmark of the big
        approx_max_k said 97ms, but standalone numbers mislead on this
        platform, SPEED.md).  Default superseg=1 (flat); the hierarchy is
        kept as a correctness-tested option for catalogs where the segment
        matrix outgrows memory."""
        B, S = segmax.shape
        k_seg = self._k_seg
        R2 = self._superseg
        if S < 4096 or R2 <= 1:  # flat selection: the matrix is small
            _, seg_ids = jax.lax.approx_max_k(segmax, k_seg, recall_target=1.0)
            return seg_ids.astype(jnp.int32)
        S2 = -(-S // R2)
        pad = S2 * R2 - S
        sm = jnp.pad(segmax, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        super_max = sm.reshape(B, S2, R2).max(axis=2)  # [B, S2]
        k2 = min(k_seg, S2)
        _, sup_ids = jax.lax.approx_max_k(super_max, k2, recall_target=1.0)
        pool = (
            sup_ids[:, :, None].astype(jnp.int32) * R2
            + jnp.arange(R2, dtype=jnp.int32)[None, None, :]
        ).reshape(B, -1)  # [B, k2*R2] candidate segment ids (padded ones
        # carry -inf segment maxes and lose the final selection)
        pool_vals = jnp.take_along_axis(sm, pool, axis=1)
        _, pos = jax.lax.approx_max_k(pool_vals, k_seg, recall_target=1.0)
        # pad segments carry -inf and cannot win while >= k_seg real
        # segments exist in the pool (guaranteed); clamp defensively so a
        # pad id can never index out of the segment tables
        return jnp.minimum(jnp.take_along_axis(pool, pos, axis=1), S - 1)

    def _rescore(self, index, uf, ti, seg_ids):
        """Stage 2: true-fp32 scores of the candidate set, Precision.HIGHEST.

        Item vectors gather SEGMENT-WISE from the segment-major copy — one
        contiguous seg*D-wide DMA per candidate segment (scattered per-item
        row gathers measured 8x slower at the ~80ns/row issue wall) —
        chunked over the batch to bound the [chunk, k_seg, seg*D] buffer."""
        D = uf.shape[1]
        has_ib = index["ib_seg"] is not None

        def score_chunk(args):
            uf_c, ti_c, seg_c = args
            b = uf_c.shape[0]
            cand = jnp.take(index["iv_seg"], seg_c, axis=0)  # [b, k_seg, seg*D]
            cand = cand.reshape(b, -1, D)  # [b, k_seg*seg, D]
            s = jnp.einsum(
                "bd,bcd->bc", uf_c, cand,
                precision=jax.lax.Precision.HIGHEST,
            )
            if has_ib:
                s = s + jnp.take(index["ib_seg"], seg_c, axis=0).reshape(b, -1)
            return jnp.where(ti_c == OUT_OF_RANGE_ID, -jnp.inf, s)

        B = uf.shape[0]
        if B <= self.rescore_chunk:
            return score_chunk((uf, ti, seg_ids))
        ch = self.rescore_chunk
        nc = B // ch  # B is a power-of-two bucket, ch a power of two
        s = jax.lax.map(
            score_chunk,
            (
                uf.reshape(nc, ch, -1),
                ti.reshape(nc, ch, ti.shape[1]),
                seg_ids.reshape(nc, ch, seg_ids.shape[1]),
            ),
        )
        return s.reshape(B, -1)

    def _filtered_topk(self, index, s, ti, user_ids, hist=None):
        """Stage 3: drop the user's train items by id, exact final top-k
        (approx_max_k recall 1.0 — PartialReduce, not a sort).

        ``hist=(banned_rows, counts)`` supplies the user's history rows
        pre-gathered OUTSIDE this program (single-device path): with the
        [U, P] table as an in-program operand XLA relayouts the WHOLE
        table per call at small B (measured 1.74ms + 80MB HBM traffic per
        query at U=1M, P=20 — the dominant B<=64 program cost)."""
        if hist is not None:
            banned, counts = hist
        else:
            banned = jnp.take(index["banned"], user_ids, axis=0)
            counts = jnp.take(index["banned_counts"], user_ids)
        valid_b = jnp.arange(banned.shape[1])[None, :] < counts[:, None]
        is_banned = jnp.logical_and(
            ti[:, :, None] == banned[:, None, :], valid_b[:, None, :]
        ).any(axis=2)
        s = jnp.where(is_banned, -jnp.inf, s)
        # a shard whose slice holds fewer than k candidates pads to k with
        # -inf/sentinel rows; the cross-shard merge drops them
        kk = min(self.k, s.shape[1])
        vals, pos = jax.lax.approx_max_k(s, kk, recall_target=1.0)
        ids = jnp.take_along_axis(ti, pos, axis=1)
        if kk < self.k:
            pad = self.k - kk
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            ids = jnp.pad(
                ids, ((0, 0), (0, pad)), constant_values=OUT_OF_RANGE_ID
            )
        return vals, ids

    def _factored_query(self, index, user_ids, banned_rows, banned_counts):
        uf = jnp.take(index["uf"], user_ids, axis=0)
        ti, seg_ids = self._candidates(index, uf)
        s = self._rescore(index, uf, ti, seg_ids)
        return self._filtered_topk(
            index, s, ti, user_ids, hist=(banned_rows, banned_counts)
        )

    def _sharded_query(self, index, user_ids):
        """Distributed query: catalog row-sharded over the `model` mesh axis.

        Each shard runs the full three-stage pipeline over its item slice
        (global ids via its offset), producing its local filtered top-k; the
        per-shard lists merge by all_gather + one small final top-k — the
        serving counterpart of the distributed eval merge
        (eval/factored.py::sharded_streaming_topk_and_counts)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

        def shard_fn(index, user_ids):
            shard = jax.lax.axis_index(MODEL_AXIS)
            offset = shard * self._local_padded
            uf = jnp.take(index["uf"], user_ids, axis=0)
            ti, seg_ids = self._candidates(index, uf, offset)
            s = self._rescore(index, uf, ti, seg_ids)
            v, ids = self._filtered_topk(index, s, ti, user_ids)
            all_v = jax.lax.all_gather(v, MODEL_AXIS)  # [m, B, k]
            all_i = jax.lax.all_gather(ids, MODEL_AXIS)
            B = v.shape[0]
            all_v = jnp.moveaxis(all_v, 0, 1).reshape(B, -1)
            all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, -1)
            mv, pos = jax.lax.top_k(all_v, self.k)  # tiny: [B, m*k]
            mi = jnp.take_along_axis(all_i, pos, axis=1)
            return mv, mi

        fn = shard_map(
            shard_fn,
            mesh=self.mesh,
            in_specs=(self._index_partition_specs(index), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(index, user_ids)

    def _direct_query(self, index, user_ids, banned_rows, banned_counts):
        I = self.data.num_items
        scores = self.model.predict_user_block(
            index["params"], index["frozen"], user_ids, index["ctx"]
        )[:, :I]
        banned, counts = banned_rows, banned_counts
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

    def _run_query(self, dev_ids):
        """(vals, ids) device arrays for one padded id bucket — no host
        fetch.  Single-device paths pre-gather the history rows in the
        tiny _hist_fn program (see _filtered_topk); the sharded path keeps
        the tables in-program (they shard over `model`)."""
        if self.mesh is not None:
            return self._query_fn(self._index, dev_ids)
        br, cr = self._hist_fn(
            self._index["banned"], self._index["banned_counts"], dev_ids
        )
        return self._query_fn(self._index, dev_ids, br, cr)

    def query(self, user_ids) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (ids, scores) for a batch of user ids.  Batches pad to
        power-of-two buckets (bounded compile count); oversize batches chunk
        at ``max_batch``."""
        if self._index is None:
            raise RuntimeError("RecServer.refresh(params, frozen) not called")
        # validate range BEFORE the int32 cast: a wide-dtype input (e.g.
        # int64 holding 2**32) would otherwise wrap to a small in-range
        # value and silently serve the wrong user
        user_ids = np.asarray(user_ids).reshape(-1)
        if user_ids.size and (
            user_ids.min() < 0 or user_ids.max() >= self.data.num_users
        ):
            # jnp.take would silently clamp and serve the wrong user
            bad = user_ids[
                (user_ids < 0) | (user_ids >= self.data.num_users)
            ][0]
            raise ValueError(
                f"user id {bad} out of range [0, {self.data.num_users})"
            )
        user_ids = user_ids.astype(np.int32)
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
        vals, ids = self._run_query(jnp.asarray(padded))
        # one combined host fetch: each device->host readback costs a full
        # round trip on remote-tunnel platforms (~29 ms measured here)
        ids, vals = jax.device_get((ids, vals))
        return ids[:n], vals[:n]

    def query_user(self, user_id: int) -> List[Tuple[int, float]]:
        ids, vals = self.query([user_id])
        return [(int(i), float(v)) for i, v in zip(ids[0], vals[0])]
