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
    streaming_topk_and_counts,
)


def sharded_streaming_topk_and_counts(
    mesh, uf, item_factors, item_bias, k, ref_scores, ref_ids, item_block
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

    def shard_fn(uf, iv, ib, ref_s, ref_i):
        shard = jax.lax.axis_index(MODEL_AXIS)
        tv, ti, counts = streaming_topk_and_counts(
            uf, iv, None if ib is None else ib, k,
            ref_scores=ref_s, ref_ids=ref_i,
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
        counts = jax.lax.psum(counts, MODEL_AXIS)
        return merged_v, merged_i, counts

    bias_spec = P() if item_bias is None else P(MODEL_AXIS)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), bias_spec, P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(uf, item_factors, item_bias, ref_scores, ref_ids)


class FactoredEvaluator:
    def __init__(
        self,
        model,
        data: Interactions,
        k: int = 20,
        user_block: int = 1024,
        item_block: int = 4096,
        mesh=None,
    ):
        self.model = model
        self.data = data
        self.k = k
        self.user_block = min(user_block, data.num_users)
        self.item_block = item_block
        self.mesh = mesh  # if set (model axis > 1): distributed streaming

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
        s_train = pointwise(train_items)  # [Bu, P]

        T = ev_items.shape[1]
        P = train_items.shape[1]
        t_valid = jnp.arange(T)[None, :] < ev_counts[:, None]
        p_valid = jnp.arange(P)[None, :] < train_counts[:, None]

        k_big = k + P  # enough candidates to survive train filtering
        if self.mesh is not None:
            top_vals, top_idx, counts_all = sharded_streaming_topk_and_counts(
                self.mesh, uf, item_factors, item_bias, k_big,
                s_eval, ev_items, self.item_block,
            )
        else:
            top_vals, top_idx, counts_all = streaming_topk_and_counts(
                uf, item_factors, item_bias, k_big,
                ref_scores=s_eval, ref_ids=ev_items,
                item_block=self.item_block,
            )
        # counts_all[t] excludes eval item t itself (by id, inside the scan)

        # corrections: counts over the neg set = all - self - train - others
        ge_train = jnp.sum(
            jnp.logical_and(
                p_valid[:, :, None], s_train[:, :, None] >= s_eval[:, None, :]
            ),
            axis=1, dtype=jnp.int32,
        )  # [Bu, T]
        ge_eval_others = jnp.sum(
            jnp.logical_and(
                jnp.logical_and(
                    t_valid[:, :, None],
                    ev_items[:, :, None] != ev_items[:, None, :],
                ),
                s_eval[:, :, None] >= s_eval[:, None, :],
            ),
            axis=1, dtype=jnp.int32,
        )
        position = jnp.sum(
            jnp.where(t_valid, counts_all - ge_train - ge_eval_others, 0),
            axis=1,
        )
        num_neg = I - train_counts - ev_counts
        denom = jnp.maximum(num_neg * ev_counts, 1).astype(jnp.float32)
        auc = 1.0 - position.astype(jnp.float32) / denom

        # top-k over candidates = filter train items, keep first k
        _, final_idx = filter_items_topk(
            top_vals, top_idx, train_items, train_counts, k
        )
        hit_mat = jnp.logical_and(
            final_idx[:, :, None] == ev_items[:, None, :],
            t_valid[:, None, :],
        ).any(axis=2)
        hits = hit_mat.sum(axis=1).astype(jnp.float32)
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

    def evaluate(self, params, frozen) -> Dict[str, float]:
        uf, item_factors, item_bias = self.model.factored_eval(params, frozen)
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
