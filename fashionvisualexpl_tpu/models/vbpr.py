"""VBPR: BPRMF + frozen visual features with a learned projection.

Capability parity with reference src/recommender/models/VBPR.py —
scoring adds <theta_u, E^T f_i> + f_i . Bp (VBPR.py:82-84), full matrix adds
Tu @ (F E)^T + F Bp (VBPR.py:95-97), and regularization extends to
{Tu, E, Bp} with E/Bp regularized as whole matrices per step (VBPR.py:121-127).

TPU notes: F is a frozen [I, dim_f] matrix living in the `frozen` pytree; the
eval path precomputes the projected item factors (F @ E and F @ Bp) once per
evaluation instead of per user block — one big MXU matmul each.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
)


class VBPR(RecommenderModel):
    name = "vbpr"

    def __init__(
        self,
        num_users: int,
        num_items: int,
        features: np.ndarray,  # [num_items, dim_f] maxabs-normalized
        embed_k: int = 128,
        embed_d: int = 20,
    ):
        super().__init__(num_users, num_items)
        if features.shape[0] != num_items:
            raise ValueError(
                f"features rows {features.shape[0]} != num_items {num_items}"
            )
        self.embed_k = embed_k
        self.embed_d = embed_d
        self.dim_f = int(features.shape[1])
        self._features = np.asarray(features, dtype=np.float32)

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        k_gu, k_gi, k_tu, k_e, k_bp = jax.random.split(rng, 5)
        params = {
            "Bi": jnp.zeros((self.num_items,), jnp.float32),
            "Gu": glorot_uniform(k_gu, (self.num_users, self.embed_k)),
            "Gi": glorot_uniform(k_gi, (self.num_items, self.embed_k)),
            "Tu": glorot_uniform(k_tu, (self.num_users, self.embed_d)),
            "E": glorot_uniform(k_e, (self.dim_f, self.embed_d)),
            "Bp": glorot_uniform(k_bp, (self.dim_f, 1)),
        }
        frozen = {"F": jnp.asarray(self._features)}
        return params, frozen

    def score(self, params, frozen, users, items):
        beta_i = jnp.take(params["Bi"], items)
        gamma_u = jnp.take(params["Gu"], users, axis=0)
        gamma_i = jnp.take(params["Gi"], items, axis=0)
        theta_u = jnp.take(params["Tu"], users, axis=0)
        f_i = jnp.take(frozen["F"], items, axis=0)
        return (
            beta_i
            + jnp.sum(gamma_u * gamma_i, axis=1)
            + jnp.sum(theta_u * (f_i @ params["E"]), axis=1)
            + (f_i @ params["Bp"])[:, 0]
        )

    def row_sharded_params(self):
        return ("Bi", "Gu", "Gi", "Tu", "F")

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        gamma_u = self.take("Gu", params["Gu"], users)
        theta_u = self.take("Tu", params["Tu"], users)
        beta_pos = self.take("Bi", params["Bi"], pos)
        beta_neg = self.take("Bi", params["Bi"], neg)
        gamma_pos = self.take("Gi", params["Gi"], pos)
        gamma_neg = self.take("Gi", params["Gi"], neg)
        f_pos = self.take("F", frozen["F"], pos)
        f_neg = self.take("F", frozen["F"], neg)

        vis_u = theta_u  # [B, d]
        x_pos = (
            beta_pos
            + jnp.sum(gamma_u * gamma_pos, axis=1)
            + jnp.sum(vis_u * (f_pos @ params["E"]), axis=1)
            + (f_pos @ params["Bp"])[:, 0]
        )
        x_neg = (
            beta_neg
            + jnp.sum(gamma_u * gamma_neg, axis=1)
            + jnp.sum(vis_u * (f_neg @ params["E"]), axis=1)
            + (f_neg @ params["Bp"])[:, 0]
        )
        loss = bpr_pairwise_loss(x_pos, x_neg)

        # VBPR.py:121-127 — batch embeddings + whole E/Bp matrices;
        # neg item bias again at reg/10
        reg_loss = (
            reg
            * (
                l2_loss(gamma_u)
                + l2_loss(gamma_pos)
                + l2_loss(gamma_neg)
                + l2_loss(theta_u)
            )
            * 2.0
            + reg * l2_loss(beta_pos) * 2.0
            + reg * l2_loss(beta_neg) * 2.0 / 10.0
            # whole-matrix terms: counted once across data-parallel replicas
            + self.global_reg_scale
            * reg
            * (l2_loss(params["E"]) + l2_loss(params["Bp"]))
            * 2.0
        )
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        return PackedSpec(
            user_tables=(("Gu", self.embed_k), ("Tu", self.embed_d)),
            item_tables=(("Gi", self.embed_k),),
            item_scalars=("Bi",),
            dense=("E", "Bp"),
            frozen_item_tables=(("F", self.dim_f),),
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None, frozen_vw=None):
        _, p_ids, n_ids = ids
        gu, tu = user_vw["Gu"], user_vw["Tu"]
        gp, gn = pos_vw["Gi"], neg_vw["Gi"]
        bp, bn = pos_vw["Bi"], neg_vw["Bi"]
        if frozen_vw is not None:  # F columns ride the packed item rows
            fp, fn_ = frozen_vw["pos"]["F"], frozen_vw["neg"]["F"]
        else:
            fp = self.take("F", frozen["F"], p_ids)
            fn_ = self.take("F", frozen["F"], n_ids)
        E, Bp = dense["E"], dense["Bp"]
        x_pos = (
            bp + jnp.sum(gu * gp, axis=1)
            + jnp.sum(tu * (fp @ E), axis=1) + (fp @ Bp)[:, 0]
        )
        x_neg = (
            bn + jnp.sum(gu * gn, axis=1)
            + jnp.sum(tu * (fn_ @ E), axis=1) + (fn_ @ Bp)[:, 0]
        )
        loss = bpr_pairwise_loss(x_pos, x_neg)
        return loss + (
            reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn) + l2_loss(tu))
            * 2.0
            + reg * l2_loss(bp) * 2.0
            + reg * l2_loss(bn) * 2.0 / 10.0
            + self.global_reg_scale * reg * (l2_loss(E) + l2_loss(Bp)) * 2.0
        )

    def item_factors(self, params, frozen):
        """Precompute (theta_i = F @ E  [I, d], visual_bias = F @ Bp  [I])."""
        theta_i = frozen["F"] @ params["E"]
        vis_bias = (frozen["F"] @ params["Bp"])[:, 0]
        return theta_i, vis_bias

    def factored_eval(self, params, frozen):
        """Factored scores for the streaming evaluator (eval/factored.py):
        u = [Gu | Tu], v = [Gi | F E], b = Bi + F Bp."""
        theta_i, vis_bias = self.item_factors(params, frozen)
        uf = jnp.concatenate([params["Gu"], params["Tu"]], axis=1)
        vf = jnp.concatenate([params["Gi"], theta_i], axis=1)
        return uf, vf, params["Bi"] + vis_bias

    def predict_all(self, params, frozen):
        theta_i, vis_bias = self.item_factors(params, frozen)
        return (
            params["Bi"][None, :]
            + params["Gu"] @ params["Gi"].T
            + params["Tu"] @ theta_i.T
            + vis_bias[None, :]
        )

    def precompute_eval(self, params, frozen):
        """Projected item factors, computed once per evaluation (the
        evaluator passes them back as ctx to every user block)."""
        return self.item_factors(params, frozen)

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        theta_i, vis_bias = (
            ctx if ctx is not None else self.item_factors(params, frozen)
        )
        gu = jnp.take(params["Gu"], user_ids, axis=0)
        tu = jnp.take(params["Tu"], user_ids, axis=0)
        return (
            params["Bi"][None, :]
            + gu @ params["Gi"].T
            + tu @ theta_i.T
            + vis_bias[None, :]
        )
