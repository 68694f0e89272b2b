"""Full-catalog evaluator.

Replaces the reference Evaluator (src/recommender/Evaluator.py) — its
fork-pool candidate-list construction (:17-33), module-global side channel
(:9-14, :154-166), and per-user Python metric loop (:181-187) — with
device-resident masks and one vectorized metric program, computed in user
blocks so eval memory is bounded at block_users x num_items.

Also provides the recommendation dump writers with the reference's TSV
formats (Evaluator.py:225-275) for downstream-tool (ranksys) parity.

Known reference bug NOT reproduced: the reference records test AUC from the
validation value ('auc_t': auc_v, Evaluator.py:220); here auc_t is the test
AUC.  Everything else matches.
"""

from __future__ import annotations

import datetime
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.data.interactions import Interactions, multi_hot, pad_lists
from fashionvisualexpl_tpu.models.base import RecommenderModel
from fashionvisualexpl_tpu.ops.metrics import (
    MeanMetrics,
    eval_users,
    mean_metrics,
    topk_recommendations,
)


def _block_starts(n: int, block: int) -> List[int]:
    return list(range(0, n, block))


class Evaluator:
    def __init__(
        self,
        model: RecommenderModel,
        data: Interactions,
        k: int = 20,
        user_block: int = 2048,
    ):
        self.model = model
        self.data = data
        self.k = k
        self.user_block = min(user_block, data.num_users)

        # device-resident eval structures (built once; the reference builds
        # candidate lists once too, via a process pool)
        self._train_mask = jnp.asarray(multi_hot(data.training_list, data.num_items))
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

        self._eval_block = jax.jit(self._eval_block_impl, static_argnums=(0,))

    # --- core ---

    def _eval_block_impl(self, split, params, frozen, user_ids, ctx):
        """Score one user block and compute its per-user metrics."""
        scores = self.model.predict_user_block(params, frozen, user_ids, ctx)
        # sharded tables are row-padded to the mesh multiple; drop pad items
        scores = scores[:, : self.data.num_items]
        train_mask = jnp.take(self._train_mask, user_ids, axis=0)
        if split == "val":
            items = jnp.take(self._val_items, user_ids, axis=0)
            counts = jnp.take(self._val_counts, user_ids)
        else:
            items = jnp.take(self._test_items, user_ids, axis=0)
            counts = jnp.take(self._test_counts, user_ids)
        return eval_users(scores, train_mask, items, counts, self.k)

    def _eval_split(self, split: str, params, frozen, ctx=None) -> MeanMetrics:
        U = self.data.num_users
        per_user = []
        if ctx is None:
            ctx = self.model.precompute_eval(params, frozen)
        for start in _block_starts(U, self.user_block):
            # fixed block shape (wrap-around tail) keeps XLA to one compile
            idx = (np.arange(self.user_block) + start) % U
            valid_in_block = np.arange(self.user_block) + start < U
            m = self._eval_block(split, params, frozen, jnp.asarray(idx), ctx)
            m = m._replace(valid=jnp.logical_and(m.valid, jnp.asarray(valid_in_block)))
            per_user.append(m)
        cat = type(per_user[0])(*[jnp.concatenate(f) for f in zip(*per_user)])
        return mean_metrics(cat)

    def evaluate(self, params, frozen) -> Dict[str, float]:
        """Metrics for validation (if present) and test, with the reference's
        results-dict schema (Evaluator.py:216-221, auc_t bug fixed)."""
        out: Dict[str, float] = {}
        ctx = self.model.precompute_eval(params, frozen)
        t = self._eval_split("test", params, frozen, ctx)
        out.update(
            hr_t=float(t.hr), p_t=float(t.prec), r_t=float(t.rec),
            auc_t=float(t.auc), ndcg_t=float(t.ndcg),
        )
        if self._val_items is not None:
            v = self._eval_split("val", params, frozen, ctx)
            out.update(
                hr_v=float(v.hr), p_v=float(v.prec), r_v=float(v.rec),
                auc_v=float(v.auc), ndcg_v=float(v.ndcg),
            )
        else:
            out.update(hr_v=0.0, p_v=0.0, r_v=0.0, auc_v=0.0, ndcg_v=0.0)
        return out

    # --- reporting (reference print format, Evaluator.py:194-215) ---

    def print_epoch(self, epoch, total_epochs, mean_loss, rec) -> None:
        print_epoch_block(self.k, epoch, total_epochs, mean_loss, rec)

    # --- recommendation dumps (Evaluator.py:225-275 formats) ---

    def store_recommendation(self, params, frozen, path: str) -> None:
        """Plain top-k TSV: `user\\titem\\tscore` rows, train items masked
        (Evaluator.py:225-239)."""
        U = self.data.num_users
        ctx = self.model.precompute_eval(params, frozen)
        with open(path, "w") as out:
            for start in _block_starts(U, self.user_block):
                idx = (np.arange(self.user_block) + start) % U
                scores = self.model.predict_user_block(
                    params, frozen, jnp.asarray(idx), ctx
                )[:, : self.data.num_items]
                tmask = jnp.take(self._train_mask, jnp.asarray(idx), axis=0)
                top_idx, top_scores = topk_recommendations(scores, tmask, self.k)
                top_idx = np.asarray(top_idx)
                top_scores = np.asarray(top_scores)
                for row in range(self.user_block):
                    u = start + row
                    if u >= U:
                        break
                    for j in range(self.k):
                        out.write(
                            f"{u}\t{top_idx[row, j]}\t{top_scores[row, j]}\n"
                        )

    def store_recommendation_attention(
        self, params, frozen, path: str, attention_fn
    ) -> None:
        """Attention-augmented top-k TSV (Evaluator.py:241-259):
        `user\\titem\\tscore\\talpha_color\\talpha_edges\\talpha_class`.

        attention_fn(params, frozen, user_ids, ctx) -> [B, I, 3] weights
        (ctx is the model's precompute_eval result, passed so the item
        encodings are not recomputed per user block).
        """
        U = self.data.num_users
        ctx = self.model.precompute_eval(params, frozen)
        with open(path, "w") as out:
            for start in _block_starts(U, self.user_block):
                idx = (np.arange(self.user_block) + start) % U
                scores = self.model.predict_user_block(
                    params, frozen, jnp.asarray(idx), ctx
                )[:, : self.data.num_items]
                att = attention_fn(params, frozen, jnp.asarray(idx), ctx)
                tmask = jnp.take(self._train_mask, jnp.asarray(idx), axis=0)
                top_idx, top_scores = topk_recommendations(scores, tmask, self.k)
                top_idx, top_scores, att = map(np.asarray, (top_idx, top_scores, att))
                for row in range(self.user_block):
                    u = start + row
                    if u >= U:
                        break
                    for j in range(self.k):
                        it = top_idx[row, j]
                        out.write(
                            f"{u}\t{it}\t{top_scores[row, j]}\t"
                            f"{att[row, it, 0]}\t{att[row, it, 1]}\t{att[row, it, 2]}\n"
                        )

    def store_recommendation_grads(
        self, params, frozen, path: str, grads_fn=None, batch_grads_fn=None
    ) -> None:
        """Gradient-attribution TSV (Evaluator.py:261-275):
        `user\\titem\\tcolor_attr\\tedges_attr` for every positive (train +
        validation + test) item of each user.

        batch_grads_fn(params, frozen, users [B], items [B, W]) -> [B, W, 2]
        engages the bucketed batched engine (explain/grads.py) — a few
        compiled programs for any catalog size; grads_fn(params, frozen,
        user, items) -> [len(items), 2] is the per-user fallback.
        """
        from fashionvisualexpl_tpu.explain.grads import write_grads_tsv

        write_grads_tsv(
            path, self.data, params, frozen,
            grads_fn=grads_fn, batch_grads_fn=batch_grads_fn,
        )


def print_epoch_block(k, epoch, total_epochs, mean_loss, rec) -> None:
    """The reference's per-epoch metric block (Evaluator.py:194-215)."""
    m = rec.metrics or {}
    print(
        "Epoch %d/%d \tLoss: %.3f \tTrain Time: %s \tEvaluation Time: %s\n"
        "Metrics@%d (Validation)\n\t\tHR\tPrec\tRec\tAUC\tnDCG\n"
        "\t\t%f\t%f\t%f\t%f\t%f\n"
        "Metrics@%d (Test)\n\t\tHR\tPrec\tRec\tAUC\tnDCG\n"
        "\t\t%f\t%f\t%f\t%f\t%f\n"
        % (
            epoch, total_epochs, mean_loss,
            datetime.timedelta(seconds=rec.train_time_s),
            datetime.timedelta(seconds=rec.eval_time_s),
            k,
            m.get("hr_v", 0), m.get("p_v", 0), m.get("r_v", 0),
            m.get("auc_v", 0), m.get("ndcg_v", 0),
            k,
            m.get("hr_t", 0), m.get("p_t", 0), m.get("r_t", 0),
            m.get("auc_t", 0), m.get("ndcg_t", 0),
        )
    )
