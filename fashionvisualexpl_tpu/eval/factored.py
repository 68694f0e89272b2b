"""Streaming evaluator for factored models (score = u_vec . i_vec + i_bias).

Computes exactly the metrics of eval/evaluator.py (reference semantics,
Evaluator.py:82-128) but WITHOUT the dense [U, I] score matrix or [U, I]
masks: a blocked scan accumulates the top-(k + max_train) candidates and the
>=-position counts, then train items are filtered out of the candidate list
and the counts corrected by directly-gathered train/eval scores.  Peak
memory is [user_block x item_block] — the path to the scaled config
(1M users x 500k items) where the dense matrix is ~2TB.

Models opt in by implementing factored_eval(params, frozen) ->
(user_factors [U, D], item_factors [I, D], item_bias [I] | None).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import Interactions, pad_lists
from fashionvisualexpl_tpu.ops.metrics import MeanMetrics, PerUserMetrics, mean_metrics
from fashionvisualexpl_tpu.ops.topk import (
    filter_items_topk,
    streaming_counts,
    streaming_topk_and_counts,
)


def sharded_streaming_counts(
    mesh, uf, item_factors, item_bias, ref_scores, banned_ids, item_block,
    impl: str = "mask", bucket_width: Optional[int] = None,
    interpret: bool = False,
):
    """Distributed counts-only pass: each model-shard scans its item rows;
    the >=-position counts psum over `model`.

    ``impl`` selects the per-shard counts engine — the same three engines
    as the single-device evaluator (mask scan / bucketed scan / fused
    Pallas kernel, all count-identical).  For the bucketed/pallas engines
    each shard re-buckets the banned ids in SHARD-LOCAL coordinates on
    device (``banned - shard*rows``; ids owned by other shards and -1
    pads fall outside [0, rows) and are dropped by the bucketing), so the
    exclusion stays BY ID per shard with no cross-shard traffic beyond
    the final psum.  ``bucket_width`` must then be a host-probed static
    width valid for EVERY shard (max over shards of banned_bucket_width
    on the shard-local ids — FactoredEvaluator probes this once)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

    m_size = mesh.shape[MODEL_AXIS]
    I = item_factors.shape[0]
    if I % m_size != 0:
        raise ValueError(f"items {I} not divisible by model axis {m_size}")
    rows = I // m_size
    if impl != "mask" and bucket_width is None:
        raise ValueError(f"impl {impl!r} needs a host-probed bucket_width")
    tile = min(item_block, rows)

    def shard_fn(uf, iv, ib, ref_s, banned):
        shard = jax.lax.axis_index(MODEL_AXIS)
        ib_l = None if ib is None else ib
        if impl == "mask":
            counts = streaming_counts(
                uf, iv, ib_l,
                ref_scores=ref_s, banned_ids=banned,
                item_block=item_block, item_offset=shard * rows,
            )
        else:
            from fashionvisualexpl_tpu.ops.topk import (
                bucket_banned_ids_device,
                streaming_counts_bucketed,
            )

            local = banned - shard * rows
            loc, msk = bucket_banned_ids_device(
                local, rows, tile, bucket_width
            )
            if impl == "pallas":
                from fashionvisualexpl_tpu.ops.counts import (
                    streaming_counts_pallas,
                )

                counts = streaming_counts_pallas(
                    uf, iv, ib_l, ref_scores=ref_s, banned_local=loc,
                    banned_valid=msk, item_block=tile,
                    interpret=interpret,
                )
            else:
                counts = streaming_counts_bucketed(
                    uf, iv, ib_l, ref_scores=ref_s, banned_local=loc,
                    banned_valid=msk, item_block=tile,
                )
        return jax.lax.psum(counts, MODEL_AXIS)

    bias_spec = P() if item_bias is None else P(MODEL_AXIS)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), bias_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(uf, item_factors, item_bias, ref_scores, banned_ids)


def sharded_streaming_topk_and_counts(
    mesh, uf, item_factors, item_bias, k, ref_scores, banned_ids, item_block
):
    """Distributed streaming pass: item factors row-sharded over `model`;
    each shard scans its local items with its global offset, then the
    candidate lists merge by all_gather + final top-k and the position
    counts by psum — the distributed top-k engine of SURVEY.md §2.3."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

    m_size = mesh.shape[MODEL_AXIS]
    I = item_factors.shape[0]
    if I % m_size != 0:
        raise ValueError(f"items {I} not divisible by model axis {m_size}")
    rows = I // m_size

    has_ref = ref_scores is not None

    def shard_fn(uf, iv, ib, ref_s, banned):
        shard = jax.lax.axis_index(MODEL_AXIS)
        tv, ti, counts = streaming_topk_and_counts(
            uf, iv, None if ib is None else ib, k,
            ref_scores=ref_s if has_ref else None,
            banned_ids=banned if has_ref else None,
            item_block=item_block, item_offset=shard * rows,
        )
        # merge candidates across shards: [M, Bu, k] -> [Bu, M*k] -> top-k
        all_tv = jax.lax.all_gather(tv, MODEL_AXIS)
        all_ti = jax.lax.all_gather(ti, MODEL_AXIS)
        Bu = tv.shape[0]
        all_tv = jnp.moveaxis(all_tv, 0, 1).reshape(Bu, -1)
        all_ti = jnp.moveaxis(all_ti, 0, 1).reshape(Bu, -1)
        merged_v, pos = jax.lax.top_k(all_tv, k)
        merged_i = jnp.take_along_axis(all_ti, pos, axis=1)
        if has_ref:
            counts = jax.lax.psum(counts, MODEL_AXIS)
        else:
            counts = jnp.zeros((uf.shape[0], 1), jnp.int32)
        return merged_v, merged_i, counts

    if not has_ref:
        # placeholders keep the shard_map signature static
        Bu = uf.shape[0]
        ref_scores = jnp.zeros((Bu, 1), jnp.float32)
        banned_ids = jnp.full((Bu, 1), -1, jnp.int32)
    bias_spec = P() if item_bias is None else P(MODEL_AXIS)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), bias_spec, P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    out_v, out_i, out_c = fn(uf, item_factors, item_bias, ref_scores, banned_ids)
    return out_v, out_i, (out_c if has_ref else None)


class FactoredEvaluator:
    def __init__(
        self,
        model,
        data: Interactions,
        k: int = 20,
        user_block: int = 1024,
        item_block: int = 4096,
        mesh=None,
        counts_impl: str = "auto",
    ):
        """counts_impl selects the >=-position-count engine:

        - "mask": the original per-block id-mask scan (ops/topk.py
          streaming_counts).
        - "bucketed": same scan with banned ids pre-bucketed per item
          block (bucket_banned_ids) — ~2.5x (SPEED.md).
        - "pallas": fused scoring+count kernel, scores never leave VMEM
          (ops/counts.py) — ~3.8x, TPU only.
        - "auto": pallas on TPU for non-trivial catalogs, else bucketed.

        All three produce IDENTICAL counts (pinned in
        tests/test_factored_eval.py) and all three run under a mesh: the
        sharded pass re-buckets banned ids per shard in shard-local
        coordinates (sharded_streaming_counts), so the distributed
        evaluator rides the same fused kernel as the single-device one."""
        self.model = model
        self.data = data
        self.k = k
        self.user_block = min(user_block, data.num_users)
        self.item_block = item_block
        self.mesh = mesh  # if set (model axis > 1): distributed streaming
        if counts_impl not in ("auto", "mask", "bucketed", "pallas"):
            raise ValueError(
                f"counts_impl {counts_impl!r} not in "
                "{'auto', 'mask', 'bucketed', 'pallas'}"
            )
        if counts_impl == "auto":
            counts_impl = (
                "pallas"
                if jax.default_backend() == "tpu"
                and data.num_items >= 16384
                else "bucketed"
            )
        self.counts_impl = counts_impl
        # best measured fused-kernel tile (SPEED.md eval section)
        self._counts_tile = 2048 if counts_impl == "pallas" else item_block
        if mesh is not None and counts_impl != "mask":
            # the sharded scan runs per-shard on rows = padded_I / m; the
            # canonical padding (parallel/spmd.py pad_rows_to_multiple)
            # makes that ceil(I / m).  Pinned here so the host width probe
            # below can bucket in shard-local coordinates; evaluate-time
            # tables of any other height are rejected loudly.
            from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

            m = mesh.shape[MODEL_AXIS]
            self._mesh_rows = -(-data.num_items // m)
            self._counts_tile = min(self._counts_tile, self._mesh_rows)

        train_padded, train_counts = pad_lists(data.training_list, pad_value=0)
        self._train_items = jnp.asarray(train_padded)
        self._train_counts = jnp.asarray(train_counts)
        test_padded, test_counts = pad_lists(data.test_list, pad_value=0)
        self._test_items = jnp.asarray(test_padded)
        self._test_counts = jnp.asarray(test_counts)
        if data.has_validation:
            val_padded, val_counts = pad_lists(data.validation_list, pad_value=0)
            self._val_items = jnp.asarray(val_padded)
            self._val_counts = jnp.asarray(val_counts)
        else:
            self._val_items = None
            self._val_counts = None

        if counts_impl != "mask":
            # the banned set (train + split eval items) is static, so the
            # bucket width W is probed once (host) and pinned — jit shapes
            # stay constant across user blocks; bucketing itself happens
            # on device inside the block fn
            from fashionvisualexpl_tpu.ops.topk import banned_bucket_width

            def masked(items, counts):
                items = np.asarray(items)
                counts = np.asarray(counts)
                v = np.arange(items.shape[1])[None, :] < counts[:, None]
                return np.where(v, items, -1).astype(np.int32)

            tr = masked(train_padded, train_counts)
            banned_np = {
                "test": np.concatenate(
                    [tr, masked(test_padded, test_counts)], axis=1
                )
            }
            if data.has_validation:
                banned_np["val"] = np.concatenate(
                    [tr, masked(val_padded, val_counts)], axis=1
                )
            if mesh is None:
                self._bucket_w = {
                    split: banned_bucket_width(
                        b, data.num_items, self._counts_tile
                    )
                    for split, b in banned_np.items()
                }
            else:
                # sharded engines bucket per shard in SHARD-LOCAL ids, so
                # the static width must cover every shard: probe each
                # shard's slice of the banned set (ids shifted into
                # [0, rows); out-of-shard ids drop, exactly as the device
                # bucketing will drop them)
                from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

                m = mesh.shape[MODEL_AXIS]
                rows = self._mesh_rows
                self._bucket_w = {
                    split: max(
                        banned_bucket_width(
                            b - s * rows, rows, self._counts_tile
                        )
                        for s in range(m)
                    )
                    for split, b in banned_np.items()
                }

        self._block_fn = jax.jit(self._eval_block, static_argnums=(0,))

    def _eval_block(self, split, uf, item_factors, item_bias, user_ids):
        """Per-user metrics for one user block, streaming over items."""
        I = item_factors.shape[0]
        k = self.k
        train_items = jnp.take(self._train_items, user_ids, axis=0)
        train_counts = jnp.take(self._train_counts, user_ids)
        if split == "val":
            ev_items = jnp.take(self._val_items, user_ids, axis=0)
            ev_counts = jnp.take(self._val_counts, user_ids)
        else:
            ev_items = jnp.take(self._test_items, user_ids, axis=0)
            ev_counts = jnp.take(self._test_counts, user_ids)

        def pointwise(items):
            v = jnp.take(item_factors, items, axis=0)  # [Bu, W, D]
            s = jnp.einsum("bd,bwd->bw", uf, v)
            if item_bias is not None:
                s = s + jnp.take(item_bias, items)
            return s

        s_eval = pointwise(ev_items)  # [Bu, T]

        T = ev_items.shape[1]
        P = train_items.shape[1]
        t_valid = jnp.arange(T)[None, :] < ev_counts[:, None]
        p_valid = jnp.arange(P)[None, :] < train_counts[:, None]

        # candidate-negative set = all - train - eval: exclusions happen BY
        # ID inside the streaming scan (externally recomputed scores can
        # differ from the block matmul in the last ulp and shift the counts
        # at exact-tie boundaries).  Pad slots become -1: never a real id.
        banned = jnp.concatenate(
            [
                jnp.where(p_valid, train_items, -1),
                jnp.where(t_valid, ev_items, -1),
            ],
            axis=1,
        )  # [Bu, P+T]

        if self.mesh is not None:
            if self.counts_impl == "mask":
                position_t = sharded_streaming_counts(
                    self.mesh, uf, item_factors, item_bias,
                    s_eval, banned, self.item_block,
                )
            else:
                rows_m = self._mesh_rows
                m = self.mesh.shape["model"]
                if I != rows_m * m:
                    raise ValueError(
                        f"sharded {self.counts_impl} counts probed for "
                        f"{rows_m} rows/shard but the table has {I} rows "
                        f"over {m} shards — pad with "
                        "parallel/spmd.py pad_rows_to_multiple"
                    )
                position_t = sharded_streaming_counts(
                    self.mesh, uf, item_factors, item_bias,
                    s_eval, banned, self._counts_tile,
                    impl=self.counts_impl,
                    bucket_width=self._bucket_w[split],
                    interpret=(
                        self.counts_impl == "pallas"
                        and jax.default_backend() != "tpu"
                    ),
                )
        elif self.counts_impl in ("pallas", "bucketed"):
            # bucketing runs ON DEVICE inside this jit: host-side buckets
            # would ship [n_blocks, Bu, W] per user block over the
            # host->device link (measured 6x slower than no bucketing at
            # all on the remote-tunnel platform)
            from fashionvisualexpl_tpu.ops.topk import (
                bucket_banned_ids_device,
                streaming_counts_bucketed,
            )

            loc, msk = bucket_banned_ids_device(
                banned, I, self._counts_tile, self._bucket_w[split]
            )
            if self.counts_impl == "pallas":
                from fashionvisualexpl_tpu.ops.counts import (
                    streaming_counts_pallas,
                )

                position_t = streaming_counts_pallas(
                    uf, item_factors, item_bias,
                    ref_scores=s_eval, banned_local=loc,
                    banned_valid=msk, item_block=self._counts_tile,
                    # interpret mode lets CPU tests exercise this path
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                position_t = streaming_counts_bucketed(
                    uf, item_factors, item_bias,
                    ref_scores=s_eval, banned_local=loc,
                    banned_valid=msk, item_block=self._counts_tile,
                )
        else:
            position_t = streaming_counts(
                uf, item_factors, item_bias,
                ref_scores=s_eval, banned_ids=banned,
                item_block=self.item_block,
            )
        position = jnp.sum(jnp.where(t_valid, position_t, 0), axis=1)
        # catalog size, NOT the (possibly mesh-padded) table height
        num_neg = self.data.num_items - train_counts - ev_counts
        denom = jnp.maximum(num_neg * ev_counts, 1).astype(jnp.float32)
        auc = 1.0 - position.astype(jnp.float32) / denom

        # count-based hits — NO top-k: under the candidate protocol
        # (negatives in id order, eval items appended at the tail,
        # heapq.nlargest stable ordering) eval item t is in the top-k iff
        # rank_t < k where rank_t = |negatives >= s_t| (= position_t,
        # >= because earlier-listed negatives win ties) + earlier eval
        # items with >= (they win ties) + later eval items with >
        later_gt = jnp.logical_and(
            s_eval[:, None, :] > s_eval[:, :, None],  # s_t' > s_t
            jnp.arange(T)[None, None, :] > jnp.arange(T)[None, :, None],
        )
        earlier_ge = jnp.logical_and(
            s_eval[:, None, :] >= s_eval[:, :, None],
            jnp.arange(T)[None, None, :] < jnp.arange(T)[None, :, None],
        )
        eval_above = jnp.logical_and(
            jnp.logical_or(later_gt, earlier_ge), t_valid[:, None, :]
        ).sum(axis=2, dtype=jnp.int32)  # [Bu, T]
        rank_t = position_t + eval_above
        hit_t = jnp.logical_and(t_valid, rank_t < k)
        hits = hit_t.sum(axis=1).astype(jnp.float32)
        hr = (hits > 0).astype(jnp.float32)
        prec = hits / float(k)
        rec = hits / jnp.maximum(ev_counts, 1).astype(jnp.float32)
        ndcg = jnp.where(
            position < k,
            jnp.log(2.0) / jnp.log(position.astype(jnp.float32) + 2.0),
            0.0,
        )
        return PerUserMetrics(hr, prec, rec, auc, ndcg, ev_counts > 0)

    def _eval_split(self, split, uf_all, item_factors, item_bias) -> MeanMetrics:
        U = self.data.num_users
        per_user = []
        for start in range(0, U, self.user_block):
            idx = (np.arange(self.user_block) + start) % U
            in_range = np.arange(self.user_block) + start < U
            uf = jnp.take(uf_all, jnp.asarray(idx), axis=0)
            m = self._block_fn(
                split, uf, item_factors, item_bias, jnp.asarray(idx)
            )
            m = m._replace(valid=jnp.logical_and(m.valid, jnp.asarray(in_range)))
            per_user.append(m)
        cat = type(per_user[0])(*[jnp.concatenate(f) for f in zip(*per_user)])
        return mean_metrics(cat)

    def _pad_items_for_mesh(self, item_factors, item_bias):
        """Pad item tables to the model-axis multiple with -inf bias: pad
        rows score -inf, so they can never satisfy a >= count nor enter a
        top-k (their -inf candidates take the OUT_OF_RANGE sentinel).
        Callers therefore pass UNPADDED tables under a mesh, exactly like
        the single-device contract — previously the caller had to pad,
        and zero-scoring pad rows silently counted as negatives."""
        from fashionvisualexpl_tpu.core.mesh import MODEL_AXIS

        m = self.mesh.shape[MODEL_AXIS]
        I = self.data.num_items
        pad = (-I) % m
        if item_bias is None:
            item_bias = jnp.zeros((I,), item_factors.dtype)
        if pad:
            item_factors = jnp.pad(item_factors, ((0, pad), (0, 0)))
            item_bias = jnp.pad(
                item_bias, (0, pad), constant_values=-jnp.inf
            )
        return item_factors, item_bias

    def evaluate(self, params, frozen) -> Dict[str, float]:
        uf, item_factors, item_bias = self.model.factored_eval(params, frozen)
        # strip any model-side row padding so pad rows cannot enter top-k
        # or counts; the mesh path re-pads to the axis multiple with -inf
        # bias (score -inf: inert everywhere)
        uf = uf[: self.data.num_users]
        item_factors = item_factors[: self.data.num_items]
        if item_bias is not None:
            item_bias = item_bias[: self.data.num_items]
        if self.mesh is not None:
            item_factors, item_bias = self._pad_items_for_mesh(
                item_factors, item_bias
            )
        out: Dict[str, float] = {}
        t = self._eval_split("test", uf, item_factors, item_bias)
        out.update(
            hr_t=float(t.hr), p_t=float(t.prec), r_t=float(t.rec),
            auc_t=float(t.auc), ndcg_t=float(t.ndcg),
        )
        if self._val_items is not None:
            v = self._eval_split("val", uf, item_factors, item_bias)
            out.update(
                hr_v=float(v.hr), p_v=float(v.prec), r_v=float(v.rec),
                auc_v=float(v.auc), ndcg_v=float(v.ndcg),
            )
        else:
            out.update(hr_v=0.0, p_v=0.0, r_v=0.0, auc_v=0.0, ndcg_v=0.0)
        return out

    def print_epoch(self, epoch, total_epochs, mean_loss, rec) -> None:
        from fashionvisualexpl_tpu.eval.evaluator import print_epoch_block

        print_epoch_block(self.k, epoch, total_epochs, mean_loss, rec)

    def store_recommendation(
        self, params, frozen, path: str, exact: bool = False
    ) -> None:
        """Plain top-k TSV (`user\\titem\\tscore`, train items excluded —
        the Evaluator.store_recommendation protocol, Evaluator.py:225-239)
        computed without ever materializing [U, I].

        Single-device: delegates to the serving engine's segment-max
        query pipeline (serve/engine.py) — measured ~8x the naive
        streaming-top-(k+P) pass at the 1M-item scale.  Under a mesh the
        distributed streaming path below runs instead.

        By default candidate generation runs in bf16: the fp32 rescore is
        exact within the candidate set, so a true top-k item would be
        dropped only if bf16 rounding displaced it past the
        ``oversample*(k+P)`` segment horizon — not observed in practice at
        oversample=4, but not guaranteed.  ``exact=True`` scores stage 1 in
        full fp32 (Precision.HIGHEST), making the dumped ranking provably
        the true fp32 top-k at ~2x the stage-1 cost."""
        users, ids, vals = self._topk_rows(params, frozen, exact=exact)
        from fashionvisualexpl_tpu.data.native import write_recs_tsv

        # native parallel formatter (tens of seconds of Python f-string
        # work at 10^7 rows); Python fallback without the toolchain
        if not write_recs_tsv(path, users, ids, vals):
            with open(path, "w") as out:
                out.writelines(
                    f"{u}\t{ids[r, j]}\t{vals[r, j]}\n"
                    for r, u in enumerate(users)
                    for j in range(self.k)
                )

    def _topk_rows(self, params, frozen, exact: bool = False):
        """Top-k (ids, scores) for every user without materializing [U, I]
        — the shared engine behind the dump writers.  Returns np arrays
        (users [U], ids [U, k], vals [U, k])."""
        if self.mesh is None:
            from fashionvisualexpl_tpu.serve import RecServer

            srv = RecServer(
                self.model, self.data, k=self.k,
                # honor this evaluator's memory budget and give the dump a
                # wide displacement margin for its bf16 candidate stage
                item_block=self.item_block, oversample=4,
                stage1_dtype="fp32" if exact else "bf16",
                history=(
                    np.asarray(self._train_items),
                    np.asarray(self._train_counts),
                ),
            )
            srv.refresh(params, frozen)
            U = self.data.num_users
            all_users, all_ids, all_vals = [], [], []
            for start in range(0, U, self.user_block):
                users = np.arange(start, min(start + self.user_block, U),
                                  dtype=np.int32)
                ids, vals = srv.query(users)
                all_users.append(users)
                all_ids.append(ids)
                all_vals.append(vals)
            users = np.concatenate(all_users)
            ids = np.concatenate(all_ids)
            vals = np.concatenate(all_vals)
            return users, ids, vals

        uf_all, item_factors, item_bias = self.model.factored_eval(
            params, frozen
        )
        uf_all = uf_all[: self.data.num_users]
        item_factors = item_factors[: self.data.num_items]
        if item_bias is not None:
            item_bias = item_bias[: self.data.num_items]
        item_factors, item_bias = self._pad_items_for_mesh(
            item_factors, item_bias
        )
        U = self.data.num_users
        P = self._train_items.shape[1]
        k_big = self.k + P
        all_ids, all_vals = [], []
        for start in range(0, U, self.user_block):
            idx = (np.arange(self.user_block) + start) % U
            uf = jnp.take(uf_all, jnp.asarray(idx), axis=0)
            train_items = jnp.take(
                self._train_items, jnp.asarray(idx), axis=0
            )
            train_counts = jnp.take(self._train_counts, jnp.asarray(idx))
            tv, ti, _ = sharded_streaming_topk_and_counts(
                self.mesh, uf, item_factors, item_bias, k_big,
                None, None, self.item_block,
            )
            vals, ids = filter_items_topk(
                tv, ti, train_items, train_counts, self.k
            )
            n = min(self.user_block, U - start)
            all_ids.append(np.asarray(ids)[:n])
            all_vals.append(np.asarray(vals)[:n])
        return (
            np.arange(U, dtype=np.int32),
            np.concatenate(all_ids),
            np.concatenate(all_vals),
        )

    def store_recommendation_attention(
        self, params, frozen, path: str, attention_fn
    ) -> None:
        """Attention-augmented top-k TSV (reference Evaluator.py:241-259
        format) without the dense [U, I] score matrix: the top-k comes from
        the streaming/serving engine (_topk_rows), then attention weights
        are computed per user block.

        attention_fn(params, frozen, user_ids, ctx) -> [B, I, 3] — the
        dense Evaluator's contract, so models plug into either evaluator
        unchanged.  Memory is [user_block, I, 3] per block (never [U, I])."""
        users, ids, vals = self._topk_rows(params, frozen)
        ctx = self.model.precompute_eval(params, frozen)
        U = self.data.num_users
        with open(path, "w") as out:
            for start in range(0, U, self.user_block):
                n = min(self.user_block, U - start)
                idx = np.arange(start, start + n)
                att = np.asarray(
                    attention_fn(params, frozen, jnp.asarray(idx), ctx)
                )
                for row in range(n):
                    u = start + row
                    for j in range(self.k):
                        it = ids[u, j]
                        out.write(
                            f"{u}\t{it}\t{vals[u, j]}\t"
                            f"{att[row, it, 0]}\t{att[row, it, 1]}\t"
                            f"{att[row, it, 2]}\n"
                        )

    def store_recommendation_grads(
        self, params, frozen, path: str, grads_fn=None, batch_grads_fn=None
    ) -> None:
        """Gradient-attribution TSV (reference Evaluator.py:261-275) — the
        dump never needs the [U, I] matrix at all, so the streaming
        evaluator delegates to the same engine as the dense one (fixes the
        AttributeError the round-2 CLI hit on
        `--rec grad_fashion --streaming_eval`)."""
        from fashionvisualexpl_tpu.explain.grads import write_grads_tsv

        write_grads_tsv(
            path, self.data, params, frozen,
            grads_fn=grads_fn, batch_grads_fn=batch_grads_fn,
        )
