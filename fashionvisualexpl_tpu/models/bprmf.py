"""BPR-MF: matrix factorization with item bias, BPR triplet loss.

Capability parity with reference src/recommender/models/BPRMF.py —
scoring x_ui = b_i + <gamma_u, gamma_i> (BPRMF.py:70-76), full matrix
Bi + Gu @ Gi^T (BPRMF.py:85), and the loss with its reference quirks
(BPRMF.py:104-112): clip(-80, 1e8) on the score difference and the negative
item bias regularized at reg/10.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fashionvisualexpl_tpu.models.base import (
    Frozen,
    Params,
    RecommenderModel,
    bpr_pairwise_loss,
    glorot_uniform,
    l2_loss,
)


class BPRMF(RecommenderModel):
    name = "bprmf"

    def __init__(self, num_users: int, num_items: int, embed_k: int = 128):
        super().__init__(num_users, num_items)
        self.embed_k = embed_k

    def init(self, rng: jax.Array) -> Tuple[Params, Frozen]:
        k_gu, k_gi = jax.random.split(rng)
        params = {
            "Bi": jnp.zeros((self.num_items,), jnp.float32),
            "Gu": glorot_uniform(k_gu, (self.num_users, self.embed_k)),
            "Gi": glorot_uniform(k_gi, (self.num_items, self.embed_k)),
        }
        return params, {}

    def score(self, params, frozen, users, items):
        beta_i = jnp.take(params["Bi"], items)
        gamma_u = jnp.take(params["Gu"], users, axis=0)
        gamma_i = jnp.take(params["Gi"], items, axis=0)
        return beta_i + jnp.sum(gamma_u * gamma_i, axis=1)

    def row_sharded_params(self):
        return ("Bi", "Gu", "Gi")

    def loss(self, params, frozen, users, pos, neg, reg, rng=None):
        gamma_u = self.take("Gu", params["Gu"], users)
        beta_pos = self.take("Bi", params["Bi"], pos)
        gamma_pos = self.take("Gi", params["Gi"], pos)
        beta_neg = self.take("Bi", params["Bi"], neg)
        gamma_neg = self.take("Gi", params["Gi"], neg)

        x_pos = beta_pos + jnp.sum(gamma_u * gamma_pos, axis=1)
        x_neg = beta_neg + jnp.sum(gamma_u * gamma_neg, axis=1)
        loss = bpr_pairwise_loss(x_pos, x_neg)

        # BPRMF.py:108-112 — embeddings at reg, pos bias at reg, neg bias at reg/10
        reg_loss = (
            reg * (l2_loss(gamma_u) + l2_loss(gamma_pos) + l2_loss(gamma_neg)) * 2.0
            + reg * l2_loss(beta_pos) * 2.0
            + reg * l2_loss(beta_neg) * 2.0 / 10.0
        )
        return loss + reg_loss

    # --- packed fast path (train/packed_generic.py) ---

    def packed_spec(self):
        from fashionvisualexpl_tpu.models.base import PackedSpec

        return PackedSpec(
            user_tables=(("Gu", self.embed_k),),
            item_tables=(("Gi", self.embed_k),),
            item_scalars=("Bi",),
            dense=(),
        )

    def packed_loss(self, user_vw, pos_vw, neg_vw, dense, frozen, ids,
                    reg, rng=None):
        gu = user_vw["Gu"]
        gp, gn = pos_vw["Gi"], neg_vw["Gi"]
        bp, bn = pos_vw["Bi"], neg_vw["Bi"]
        x_pos = bp + jnp.sum(gu * gp, axis=1)
        x_neg = bn + jnp.sum(gu * gn, axis=1)
        loss = bpr_pairwise_loss(x_pos, x_neg)
        return loss + (
            reg * (l2_loss(gu) + l2_loss(gp) + l2_loss(gn)) * 2.0
            + reg * l2_loss(bp) * 2.0
            + reg * l2_loss(bn) * 2.0 / 10.0
        )

    def factored_eval(self, params, frozen):
        """Factored scores for the streaming evaluator (eval/factored.py)."""
        return params["Gu"], params["Gi"], params["Bi"]

    def predict_all(self, params, frozen):
        return params["Bi"][None, :] + params["Gu"] @ params["Gi"].T

    def predict_user_block(self, params, frozen, user_ids, ctx=None):
        gu = jnp.take(params["Gu"], user_ids, axis=0)
        return params["Bi"][None, :] + gu @ params["Gi"].T
